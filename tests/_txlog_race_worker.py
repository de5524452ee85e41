"""Subprocess worker for the multi-process TxLog writer race soak
(tests/test_lakehouse.py::test_multiprocess_writer_race).

Each worker is a SEPARATE OS process with its own JVM/SparkSession —
a true concurrent writer, not a thread sharing the parent's context —
hammering one shared table with MERGE (retried on ConflictError, as
the merge contract instructs callers), one OPTIMIZE and one VACUUM.
argv: table_path worker_id iters [part]

With the optional 4th arg "part" the worker targets a hive-partitioned
table (partition column `bucket`): each iteration's rows carry
bucket = b{(user_id + i) % 3}, so every merge MOVES its rows to a
different partition directory — the partition-coherence stress is the
point, not just the commit race.
"""

from __future__ import annotations

import random
import sys
import time


def main() -> int:
    path, wid, iters = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    part = len(sys.argv) > 4 and sys.argv[4] == "part"
    chaos = len(sys.argv) > 4 and sys.argv[4] == "chaos"

    from pyspark.sql import SparkSession

    from cdc_plg_spark.lakehouse import ConflictError, TxLogTable

    spark = (SparkSession.builder.master("local[2]")
             .appName(f"txlog-race-worker-{wid}")
             .config("spark.sql.shuffle.partitions", "2")
             .config("spark.ui.enabled", "false")
             .config("spark.sql.session.timeZone", "UTC")
             .getOrCreate())
    try:
        t = TxLogTable(spark, path)
        if chaos:
            return _chaos(t, spark, wid, iters)
        lo = 1000 + wid * 100
        for i in range(iters):
            if part:
                src = spark.createDataFrame(
                    [(lo + k, wid * 10000 + i, f"b{(lo + k + i) % 3}")
                     for k in range(20)],
                    "user_id long, value long, bucket string")
            else:
                src = spark.createDataFrame(
                    [(lo + k, wid * 10000 + i) for k in range(20)],
                    "user_id long, value long")
            for _attempt in range(200):
                try:
                    t.merge(src)
                    break
                except ConflictError:
                    # jittered backoff: on an oversubscribed host the
                    # three workers otherwise livelock re-reading and
                    # re-losing the same version slot until the retry
                    # budget drains (observed as a contention-only
                    # flake when the suite shares CPUs with other jobs)
                    time.sleep(random.random() * min(0.05 * _attempt, 0.5))
                    continue
            else:
                print(f"worker {wid}: merge {i} never committed",
                      file=sys.stderr)
                return 2
            if i == iters // 2:
                try:
                    # force a real compaction commit into the race
                    t.optimize(small_bytes=1 << 30)
                except ConflictError:
                    pass        # lost to a concurrent commit — fine
        try:
            # retention age protects the other workers' in-flight files
            t.vacuum(retain_last=2, min_age_s=3600)
        except ConflictError:
            pass
        return 0
    finally:
        spark.stop()




def _chaos(t, spark, wid: int, iters: int) -> int:
    """Chaos mode: every format op the fourth r6 session added —
    predicate DELETE (cow + dv) and RESTORE — raced across process
    boundaries against merges/optimize/vacuum, plus (r10) the content
    seal: STAMP_HASHES commits interleaved with rewrites and vacuums
    from OTHER processes, covering the seal's retry loop and the
    vanished-mid-hash tolerance.  No content expectation here
    (restores rewind by design); the parent asserts log
    serializability + deep fsck instead.  Any exception other
    than the documented conflict/validation outcomes is a failure."""
    from cdc_plg_spark.lakehouse import ConflictError

    rng = random.Random(1000 + wid)
    lo = 1000 + wid * 100
    for i in range(iters):
        kind = rng.choice(("merge", "merge", "delete_pred",
                           "restore", "optimize", "vacuum", "stamp"))
        try:
            if kind == "merge":
                src = spark.createDataFrame(
                    [(lo + k, wid * 10000 + i) for k in range(10)],
                    "user_id long, value long")
                for _ in range(60):
                    try:
                        t.merge(src)
                        break
                    except ConflictError:
                        time.sleep(random.random() * 0.2)
            elif kind == "delete_pred":
                vlo = rng.randint(0, 40000)
                t.delete_where(
                    where_between=("value", vlo, vlo + 5000),
                    mode=rng.choice(("cow", "dv")))
            elif kind == "restore":
                vs = t._versions()
                t.restore(rng.choice(vs[-3:]))
            elif kind == "optimize":
                t.optimize(small_bytes=1 << 30)
            elif kind == "stamp":
                t.stamp_hashes()
            else:
                # age guard: in-flight neighbors' files stay safe
                t.vacuum(retain_last=3, min_age_s=3600)
        except (ConflictError, ValueError):
            # lost a commit race / target version truncated or
            # vacuumed mid-flight — both documented outcomes
            continue
    return 0


if __name__ == "__main__":
    sys.exit(main())
