"""BPE training wall-time evidence (VERDICT r04 brief #3).

Trains a production-scale merge count on a deterministic synthetic
wide-vocab corpus (the sf* documents tables have a 31-word vocabulary,
which exhausts merges at ~89) and prints one JSON line. The corpus is
200k distinct md5-hex words with Zipf-capped frequencies — a
pathological WORST case for the incremental trainer (every word shares
one 16-char alphabet, so early merges touch nearly the whole vocab;
natural-language affected-sets decay much faster).

Usage: python tools/bpe_bench.py [n_merges] [n_words]
Results are recorded in BENCH/BASELINE.md ("BPE training" section).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from warctools_spark.operators.bpe import _train_driver  # noqa: E402
from warctools_spark.operators.text_analysis import (  # noqa: E402
    token_frequencies,
)
from warctools_spark.session import get_spark  # noqa: E402


def main() -> None:
    n_merges = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    n_words = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
    spark = get_spark(master="local[32]", shuffle_partitions=32)
    docs = spark.range(n_words).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.array_repeat(
                F.md5(F.col("id").cast("string")),
                F.least(
                    F.lit(1000),
                    (F.lit(1_000_000) / (F.col("id") + 1)).cast("int") + 1,
                ),
            ),
        ).alias("text"),
    )
    t0 = time.time()
    rows = token_frequencies(docs).collect()
    t1 = time.time()
    merges, _ = _train_driver(
        [(r["token"], r["n"]) for r in rows], n_merges
    )
    t2 = time.time()
    print(
        json.dumps(
            {
                "metric": "bpe_train wall",
                "n_merges": len(merges),
                "vocab": len(rows),
                "corpus_agg_sec": round(t1 - t0, 2),
                "trainer_sec": round(t2 - t1, 2),
                "total_sec": round(t2 - t0, 2),
                "sec_per_merge": round((t2 - t1) / max(len(merges), 1), 4),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
