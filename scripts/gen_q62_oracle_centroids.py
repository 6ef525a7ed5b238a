"""Regenerate the pinned q62 oracle centroids for the driver tier.

q62's k-means trainer is iterative (not SQL-expressible), but it is
DETERMINISTIC: a fixed xxhash64-ordered sample + seeded NumPy k-means
over a fixed dataset always yields the same centroids. The driver's
correctness check runs at exactly sf0.01 on fixed parquet, so the
trained centroids for that tier are a constant — and once pinned as
literals, the REST of q62 (cell assignment, probe sets, exact + IVF
ranks, recall) is plain window SQL a DuckDB oracle can replay
(VERDICT r3 item 3).

Run after any testdata regeneration or trainer change:

    python scripts/gen_q62_oracle_centroids.py

Rewrites cdc_example_spark/queries/q62_centroids_sf001.py. A drifted
pin fails loudly: tests/test_llm_operators.py re-trains at sf0.01 and
asserts equality with the pinned values.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = "/root/testdata/sf0.01"
OUT = os.path.join(REPO, "cdc_example_spark", "queries", "q62_centroids_sf001.py")

HEADER = '''"""Pinned q62 oracle centroids (GENERATED — do not edit by hand).

Regenerate with ``python scripts/gen_q62_oracle_centroids.py`` after a
testdata regeneration or a trainer change. Produced by
``operators.similarity.train_ivf_centroids_local(embeddings,
n_centroids=8, sample_size=512, n_iters=10)`` over {sf_dir} —
the exact call q62 makes at the driver's correctness tier, so the
oracle's literals equal the centroids the Spark side trains at run
time. Floats are repr round-trips: parsing the decimal string yields
the bit-identical double on both engines.
"""

SF_DIR = {sf_dir!r}

CENTROIDS_SF001 = [
'''


def main() -> None:
    from cdc_example_spark.operators.similarity import train_ivf_centroids_local
    from cdc_example_spark.session import get_spark
    from cdc_example_spark.sources.catalog import load_table

    spark = get_spark("gen-q62-centroids")
    emb = load_table(spark, SF_DIR, "embeddings", cache=False)
    C = train_ivf_centroids_local(emb, n_centroids=8, sample_size=512, n_iters=10)
    with open(OUT, "w") as f:
        f.write(HEADER.format(sf_dir=SF_DIR))
        for row in C:
            f.write("    [{}],\n".format(", ".join(repr(x) for x in row)))
        f.write("]\n")
    print(f"wrote {OUT}: {len(C)} centroids × dim {len(C[0])}")
    spark.stop()


if __name__ == "__main__":
    main()
