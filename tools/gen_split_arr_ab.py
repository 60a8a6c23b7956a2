"""Paired A/B: lexicon arrays as inline array(...) literals (HEAD) vs a
split('w1;w2;...', ';') form that the analyzer sees as 3 nodes and the
optimizer constant-folds to the IDENTICAL ArrayData literal (r19 item 2:
the generator's ~9.7 s analyzer fixed cost is per-table rule application
over ~600 KB expression trees; the 256-element sentence banks and the
400-element email pair bank dominate the node count).

Both arms run _gen_full_schema (the bench body) in ONE JVM, alternating,
REPS times each. Also times one representative WIDE table's analysis in
isolation per arm.

Usage: python tools/gen_split_arr_ab.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = int(os.environ.get("PROBE_REPS", "2"))


def split_form(items: list[str]) -> str:
    joined = ";".join(items)
    from synthetic_data_transfer_to_relational_database_spark.functions.generators import _qs

    return f"split({_qs(joined)}, ';')"


def main() -> None:
    from synthetic_data_transfer_to_relational_database_spark.functions import generators as G
    from synthetic_data_transfer_to_relational_database_spark.session import get_spark
    import bench

    spark = get_spark("gen-split-ab")

    orig_arr = G._arr

    def arr_split(items: list[str]) -> str:
        key = tuple(items)
        c = G._ARR_CACHE.get(key)
        if c is None:
            if len(items) >= 16 and all(w and ";" not in w for w in items):
                c = split_form(list(items))
            else:
                c = "array(" + ",".join(G._qs(w) for w in items) + ")"
            G._ARR_CACHE[key] = c
        return c

    # value-identity spot check: folded split == folded array, elementwise
    for bank in (G.WORDS, G._EMAIL_PAIRS, G._sentence_bank(4, "head")):
        a = [r[0] for r in spark.sql(
            "SELECT explode(" + orig_arr(bank) + ")").collect()]
        b = [r[0] for r in spark.sql(
            "SELECT explode(" + split_form(bank) + ")").collect()]
        assert a == b == list(bank), f"mismatch on bank of {len(bank)}"
    print("value-identity: ok (3 banks)", flush=True)

    for rep in range(REPS):
        for arm, impl in (("array", orig_arr), ("split", arr_split)):
            G._arr = impl
            G._ARR_CACHE.clear()
            t0 = time.perf_counter()
            bench._gen_full_schema(spark)
            dt = time.perf_counter() - t0
            print(f"[{arm}] rep{rep} gen_full_schema={dt:.3f}", flush=True)
    G._arr = orig_arr
    G._ARR_CACHE.clear()
    spark.stop()


if __name__ == "__main__":
    main()
