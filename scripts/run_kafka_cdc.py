"""Manual Kafka CDC verification against the reference's compose stack.

The sandbox this engine is built in has no Kafka broker and no network,
so the Kafka source cannot be integration-tested here (README "Kafka
status"). This script is the exact procedure to verify it on a machine
that can run the reference's own dev topology:

1. Start the reference stack (Postgres + Debezium + Kafka):

       cd <reference checkout>/prototype
       docker compose up -d
       ./setup-debezium.sh       # registers the connector; topic
                                 # prefix "messages" over public.messages
                                 # (setup-debezium.sh:22)

2. Run this script with the Kafka package pinned to Spark's
   Scala/version line (pyspark 4.1.x is Scala 2.13):

       spark-submit \
         --packages org.apache.spark:spark-sql-kafka-0-10_2.13:4.1.2 \
         scripts/run_kafka_cdc.py \
         --brokers 127.0.0.1:9092 \
         --topic messages.public.messages \
         --state-dir /tmp/cdc_state \
         --checkpoint /tmp/cdc_ckpt

3. Insert/update/delete rows in the reference's `messages` table (e.g.
   via its REST API) and watch the materialized parquet state under
   --state-dir converge: the same scenario tests/test_cdc_apply.py
   replays through the file source, now fed by real Debezium envelopes.

Everything downstream of the source (decode → route → MERGE) is the
code path the S-suites cover; the only untested-in-sandbox element is
the Kafka connector wiring itself, which this script exercises.
"""

from __future__ import annotations

import argparse


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--brokers", default="127.0.0.1:9092")
    ap.add_argument("--topic", default="messages.public.messages")
    ap.add_argument("--state-dir", default="/tmp/cdc_state")
    ap.add_argument("--checkpoint", default="/tmp/cdc_ckpt")
    ap.add_argument("--starting-offsets", default="latest")
    args = ap.parse_args()

    from cdc_example_spark.operators.keyed_state import KeyedStateSink
    from cdc_example_spark.session import get_spark
    from cdc_example_spark.streaming.materialize import kafka_cdc_source, materialize

    spark = get_spark("cdc-kafka-verify")
    raw = kafka_cdc_source(
        spark, args.brokers, args.topic, starting_offsets=args.starting_offsets
    ).selectExpr("CAST(key AS STRING) AS key", "CAST(value AS STRING) AS value")
    sink = KeyedStateSink(path=args.state_dir)
    query = materialize(raw, sink, checkpoint_dir=args.checkpoint)
    print(f"materializing {args.topic} from {args.brokers} -> {args.state_dir}")
    query.awaitTermination()


if __name__ == "__main__":
    main()
