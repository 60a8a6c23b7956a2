#!/usr/bin/env python
"""A/B the Spark 4.1 single-pass analyzer on the gen_full_schema build.

The r11 fixed-cost profile pinned plan construction at ~9.7 s per
bench-scale 85-table build, ~85% of it py4j-wait on the JVM ANALYZER
(one eager Dataset.ofRows analysis per table over ~600 KB expression
trees). Spark 4.1 ships an experimental single-pass resolver
(spark.sql.analyzer.singlePassResolver.enabled, default false) that
replaces the fixed-point rule executor; if it analyzes these trees, the
fixed cost should drop.

Alternating A/B in ONE warmed JVM (legacy, single-pass, legacy,
single-pass) so codegen caches and rig drift hit both arms equally.
Usage: python tools/gen_analyzer_ab.py [n_pairs]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CONF = "spark.sql.analyzer.singlePassResolver.enabled"


def main() -> None:
    n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    import bench
    from synthetic_data_transfer_to_relational_database_spark import registry
    from synthetic_data_transfer_to_relational_database_spark.session import get_spark

    spark = get_spark("gen-analyzer-ab")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    bench._materialize(registry.all_queries()["revenue_by_nation"](spark, sf_dir))

    results = {"legacy": [], "singlepass": []}
    for _ in range(n_pairs):
        for arm, flag in (("legacy", "false"), ("singlepass", "true")):
            spark.conf.set(CONF, flag)
            try:
                t0 = time.perf_counter()
                bench._gen_full_schema(spark, fk_skew=0.0)
                dt = time.perf_counter() - t0
                results[arm].append(round(dt, 3))
            except Exception as e:  # noqa: BLE001 — record the failure arm
                results[arm].append(f"FAILED: {str(e)[:200]}")
            finally:
                spark.conf.set(CONF, "false")
            spark.catalog.clearCache()
            print(json.dumps({arm: results[arm][-1]}), flush=True)
    print(json.dumps({"results": results, "loadavg": list(os.getloadavg())}))
    spark.stop()


if __name__ == "__main__":
    main()
