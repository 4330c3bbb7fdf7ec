"""Distributed maintenance walks (VERDICT r14 #7): executor-side
listing + deletion for the lake vacuum/clean faces.

The maintenance faces resolve their KEEP set from metadata (retained
manifests / active adds / timeline stats — KB-to-MB tier, stays
driver-side), but the reclaim itself must visit every physical file
under the data root. At warehouse scale a driver `os.walk` is fine;
at a genuine 100 TB table the listing is the bottleneck — so
`distributed_reclaim` fans the walk out: one Spark task per
first-level partition directory lists its subtree, the candidates
anti-join the keep frame (a real shuffle join, not a broadcast — the
keep set of a 100 M-file table is GBs), and a second executor stage
deletes. On an object store the per-directory units map to prefix
listings, the same parallel shape real table services use.

Local-mode honesty: on one machine the filesystem serializes the
I/O anyway, so the flag buys plan SHAPE (verified by test), not
local speed."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def distributed_reclaim(
    spark: SparkSession,
    data_root: str,
    keep: set,
    suffixes: tuple,
    exclude_dirs: tuple = (),
    name_ok=None,
) -> int:
    """Delete every file under `data_root` whose name ends in one of
    `suffixes` (or satisfies `name_ok`, when given — e.g. Delta's
    deletion_vector_*.bin prefix+suffix shape) and whose normalized
    absolute path is NOT in `keep`. Returns the number deleted.
    Listing, keep-join and deletion all run in executors; the driver
    handles only the first-level directory fan-out and the keep
    frame's creation. Hidden (dot-prefixed) directories and any in
    `exclude_dirs` (by name, e.g. _delta_log) are pruned like the
    caller's driver walk would.

    The returned count is best-effort under Spark task RETRY or
    speculation: a retried delete task finds its first attempt's
    files already gone (counted 0) — the filesystem end-state is
    identical either way, only the tally can undercount. Local-mode
    tests see no retries, so twin-walk count equality holds there."""
    data_root = os.path.abspath(data_root)
    if not os.path.isdir(data_root):
        return 0  # metadata-only table: the driver walk no-ops too
    excl = set(exclude_dirs)
    units = []
    subdirs = [
        os.path.join(data_root, d)
        for d in os.listdir(data_root)
        if not d.startswith(".")
        and d not in excl
        and os.path.isdir(os.path.join(data_root, d))
    ]
    for d in sorted(subdirs):
        units.append((d, True))
    units.append((data_root, False))  # the root's own direct files

    suffixes_t = tuple(suffixes)
    ok = name_ok if name_ok is not None else (
        lambda n: n.endswith(suffixes_t)
    )

    def list_files(batches):
        import os as _os

        import pandas as _pd

        for pdf in batches:
            rows = []
            for d, rec in zip(pdf["dir"], pdf["recurse"]):
                if rec:
                    for root, dirs, files in _os.walk(d):
                        dirs[:] = [
                            x
                            for x in dirs
                            if not x.startswith(".") and x not in excl
                        ]
                        for n in files:
                            if ok(n):
                                rows.append(
                                    _os.path.normpath(
                                        _os.path.join(root, n)
                                    )
                                )
                else:
                    for n in _os.listdir(d):
                        p = _os.path.join(d, n)
                        if ok(n) and _os.path.isfile(p):
                            rows.append(_os.path.normpath(p))
            yield _pd.DataFrame({"path": rows})

    def remove_files(batches):
        import os as _os

        import pandas as _pd

        for pdf in batches:
            n = 0
            for p in pdf["path"]:
                try:
                    _os.remove(p)
                    n += 1
                except FileNotFoundError:
                    pass  # concurrent reclaim already got it
            yield _pd.DataFrame({"n": [n]})

    # parallelize with explicit slices, NOT createDataFrame +
    # repartition: the local-relation + exchange form spends a whole
    # shuffle stage distributing a handful of directory names (same
    # fix as hudi._parse_log_frame).
    listed = spark.createDataFrame(
        spark.sparkContext.parallelize(units, min(len(units), 32)),
        "dir string, recurse boolean",
    ).mapInPandas(list_files, "path string")
    keep_df = spark.createDataFrame(
        [(p,) for p in keep] or [], "path string"
    )
    doomed = listed.join(keep_df, "path", "left_anti")
    out = (
        doomed.mapInPandas(remove_files, "n long")
        .agg(F.sum("n").alias("n"))
        .first()["n"]
    )
    return int(out or 0)
