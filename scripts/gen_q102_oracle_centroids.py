"""Regenerate the pinned q102 oracle centroids (two-level IVF, sf0.01).

Same rationale as gen_q62_oracle_centroids.py: the two-level trainer
(operators/similarity.train_ivf2_local) is iterative but DETERMINISTIC
over fixed parquet, so the driver-tier (sf0.01) coarse + fine centroids
are constants; pinned as literals, the whole two-level assignment /
probe / serve replays as window SQL in DuckDB.

Run after any testdata regeneration or trainer change:

    python scripts/gen_q102_oracle_centroids.py

Rewrites cdc_example_spark/queries/q102_ivf2_sf001.py. A drifted pin
fails loudly: tests/test_ivf2.py re-trains at sf0.01 and asserts
equality with the pinned values.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = "/root/testdata/sf0.01"
OUT = os.path.join(REPO, "cdc_example_spark", "queries", "q102_ivf2_sf001.py")

HEADER = '''"""Pinned q102 oracle centroids (GENERATED — do not edit by hand).

Regenerate with ``python scripts/gen_q102_oracle_centroids.py`` after a
testdata regeneration or a trainer change. Produced by
``operators.similarity.train_ivf2_local(embeddings, n_coarse={nc},
n_fine={nf}, sample_size=512, n_iters=10)`` over {sf_dir} — the exact
call q102 makes at the driver's correctness tier ((n_coarse, n_fine) =
ivf2_shape_for(500) = ({nc}, {nf})), so the oracle's literals equal the
centroids the Spark side trains at run time. Floats are repr
round-trips: parsing the decimal string yields the bit-identical
double on both engines.
"""

SF_DIR = {sf_dir!r}

COARSE_SF001 = [
'''


def main() -> None:
    from cdc_example_spark.operators.similarity import (
        ivf2_shape_for,
        train_ivf2_local,
    )
    from cdc_example_spark.session import get_spark
    from cdc_example_spark.sources.catalog import load_table

    spark = get_spark("gen-q102-centroids")
    emb = load_table(spark, SF_DIR, "embeddings", cache=False)
    nc, nf = ivf2_shape_for(emb.count())
    coarse, fines = train_ivf2_local(
        emb, n_coarse=nc, n_fine=nf, sample_size=512, n_iters=10
    )
    with open(OUT, "w") as f:
        f.write(HEADER.format(sf_dir=SF_DIR, nc=nc, nf=nf))
        for row in coarse:
            f.write("    [{}],\n".format(", ".join(repr(x) for x in row)))
        f.write("]\n\nFINES_SF001 = [\n")
        for cell in fines:
            f.write("    [\n")
            for row in cell:
                f.write("        [{}],\n".format(", ".join(repr(x) for x in row)))
            f.write("    ],\n")
        f.write("]\n")
    print(
        f"wrote {OUT}: {len(coarse)} coarse × dim {len(coarse[0])}, "
        f"fines {[len(c) for c in fines]}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
