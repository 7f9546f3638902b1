"""Regenerate pystore_spark/resources/bpe_merges.txt from the
sf0.001 synthetic documents sample (deterministic — frequency-desc /
lexicographic tie-break, no RNG). The shipped file is a fixed
artifact like a published tokenizer's merges.txt; rerun this only to
retrain deliberately.

Usage: python tools/train_bpe_merges.py [sf_dir] [n_merges]
"""

from __future__ import annotations

import re
import sys
from collections import Counter
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pystore_spark.functions.bpe import (  # noqa: E402
    DEFAULT_MERGES_PATH,
    save_merges,
    train_bpe_from_counts,
)
from pystore_spark.functions.text import BPE_TOKEN_RE  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    n_merges = int(sys.argv[2]) if len(sys.argv) > 2 else 48
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT text FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchall()
    pat = re.compile(BPE_TOKEN_RE)
    counts: Counter = Counter()
    for (t,) in docs:
        for m in pat.finditer(t or ""):
            counts[m.group(0)] += 1
    merges = train_bpe_from_counts(dict(counts), n_merges)
    save_merges(merges, DEFAULT_MERGES_PATH)
    print(f"wrote {len(merges)} merges to {DEFAULT_MERGES_PATH}")


if __name__ == "__main__":
    main()
