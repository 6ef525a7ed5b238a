"""Property tests for the round-6 additions: the Avro binary codec
(random values through the envelope schema must round-trip exactly)
and the segment span dedup (random corpora must match a dict model of
first-occurrence survivorship). Spark-side properties run few examples
(each is a job); the pure-python codec property runs many.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from cdc_example_spark.operators.dedup import segment_dedup_stats
from cdc_example_spark.streaming import avro_envelope as A

# --------------------------------------------------------------------------
# Avro codec: encode(decode) identity over the full envelope value space
# --------------------------------------------------------------------------

_text = st.text(min_size=0, max_size=40)

_image = st.fixed_dictionaries(
    {
        "id": _text,
        "create_time": _text,
        "update_time": _text,
        "message": _text,  # arbitrary unicode, incl. multibyte + surrogpairs-free
        "username": _text,
    }
)

_value = st.fixed_dictionaries(
    {
        "before": st.none() | _image,
        "after": st.none() | _image,
        "source": st.fixed_dictionaries(
            {
                "version": _text,
                "connector": _text,
                "name": _text,
                "ts_ms": st.integers(min_value=-(2**63), max_value=2**63 - 1),
                "lsn": st.integers(min_value=-(2**63), max_value=2**63 - 1),
            }
        ),
        "op": st.sampled_from(["c", "u", "d", "r"]),
        "ts_ms": st.none() | st.integers(min_value=-(2**63), max_value=2**63 - 1),
    }
)


@settings(max_examples=200, deadline=None)
@given(val=_value)
def test_avro_value_round_trips_exactly(val):
    buf = A.avro_encode(A.VALUE_SCHEMA, val)
    got, pos = A.avro_decode(A.VALUE_SCHEMA, buf)
    assert pos == len(buf)
    assert got == val


@settings(max_examples=200, deadline=None)
@given(
    sid=st.integers(min_value=0, max_value=2**32 - 1),
    body=st.binary(max_size=64),
)
def test_confluent_frame_round_trips(sid, body):
    assert A.confluent_unframe(A.confluent_frame(sid, body)) == (sid, body)


# --------------------------------------------------------------------------
# Segment dedup: random corpora vs a dict model
# --------------------------------------------------------------------------

_corpus = st.lists(
    st.lists(st.sampled_from(list("abcde")), min_size=0, max_size=13),
    min_size=1,
    max_size=8,
)


def _model(corpus, seg_len):
    seen = set()
    out = {}
    for doc_id, toks in enumerate(corpus):
        segs = [
            " ".join(toks[i : i + seg_len])
            for i in range(0, len(toks), seg_len)
        ]
        if not segs:
            # Zero-token docs yield zero segments and, like the q101
            # oracle, no output row at all (ADVICE r6: without the
            # empty-array guard, F.sequence(0, -1) emitted 2 phantoms).
            continue
        kept = 0
        for s in segs:
            if s not in seen:
                seen.add(s)
                kept += 1
        out[doc_id] = (len(segs), kept)
    return out


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(corpus=_corpus, seg_len=st.sampled_from([1, 3, 4]))
def test_segment_dedup_matches_dict_model(spark, corpus, seg_len):
    df = spark.createDataFrame(
        [(i, toks) for i, toks in enumerate(corpus)],
        "doc_id long, ws array<string>",
    )
    got = {
        r.doc_id: (r.n_segs, r.n_kept)
        for r in segment_dedup_stats(df, seg_len=seg_len).collect()
    }
    assert got == _model(corpus, seg_len)
