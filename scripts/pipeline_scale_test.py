"""Warmed full-pipeline scaling measurement at one core count.

Two master modes:
- default: local[cpus] (threads in one JVM);
- --executors N: local-cluster[N, exec-cores, exec-mem] — N REAL executor
  JVMs (task serialization, broadcast ship, netty shuffle fetch, Python
  workers importing the package from an addPyFile zip), the literal
  "N executors" reading of the two-cluster-size protocol.  `cpus` is then
  N * exec-cores for config sizing.
"""
import argparse, json, os, shutil, sys, tempfile, time, zipfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _zip_pkg(tmp: str) -> str:
    """Package ebel_spark like spark-submit --py-files would."""
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    zpath = os.path.join(tmp, "ebel_spark.zip")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        for r, _, files in os.walk(os.path.join(root, "ebel_spark")):
            if "__pycache__" in r:
                continue
            for f in files:
                if f.endswith(".py"):
                    p = os.path.join(r, f)
                    z.write(p, os.path.relpath(p, root))
    return zpath


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, required=True)
    ap.add_argument("--files", type=int, default=20000)
    ap.add_argument("--stmts", type=int, default=250)
    ap.add_argument("--warm-files", type=int, default=1000)
    ap.add_argument("--executors", type=int, default=None,
                    help="run on local-cluster with this many executor "
                         "JVMs instead of local[cpus] threads")
    ap.add_argument("--exec-cores", type=int, default=2)
    ap.add_argument("--exec-mem-mb", type=int, default=6144)
    ap.add_argument("--scratch", default="/dev/shm",
                    help="scratch root for shuffle dirs + outputs; tmpfs "
                         "models the per-executor local disks of a real "
                         "cluster (which scale with node count, unlike "
                         "this sandbox's single shared 250 MB/s virtio "
                         "disk)")
    args = ap.parse_args()

    from ebel_spark.session import get_spark
    from ebel_spark.corpus import CorpusProfile, corpus_spark
    from ebel_spark.pipeline import run_pipeline
    from ebel_spark import parse as P

    scratch = tempfile.mkdtemp(prefix="belscale_", dir=args.scratch)
    master = None
    if args.executors:
        master = (f"local-cluster[{args.executors},{args.exec_cores},"
                  f"{args.exec_mem_mb}]")
        args.cpus = args.executors * args.exec_cores
        # executor JVMs are sized by the master string; the driver only
        # coordinates + collects tiny results (SPARK_DRIVER_MEM drives
        # both -Xmx and the pinned -Xms in get_spark)
        os.environ.setdefault("SPARK_DRIVER_MEM", "8g")
    spark = get_spark(cores=args.cpus, app_name="pipe-scale", master=master,
                      extra={
                          "spark.local.dir": os.path.join(scratch, "local"),
                      })
    if args.executors:
        spark.sparkContext.addPyFile(_zip_pkg(scratch))

    def one(files, label):
        profile = CorpusProfile(n_files=files, statements_per_file=args.stmts,
                                error_rate=0.005)
        src = P.with_file_sha(corpus_spark(spark, profile)).persist()
        src.count()
        d = tempfile.mkdtemp(prefix=f"ps_{label}_", dir=scratch)
        try:
            t0 = time.time()
            m = run_pipeline(spark, src, d, with_hints=False,
                             run_id=label, dedup_source=False)
            wall = time.time() - t0
        finally:
            shutil.rmtree(d, ignore_errors=True)
            src.unpersist()
        return wall, m

    one(args.warm_files, "warm")
    walls, stages = [], []
    for i in range(2):
        wall, m = one(args.files, f"run{i}")
        walls.append(round(wall, 2))
        stages.append(m["stages"])
    best = min(walls)
    print(json.dumps({
        "cpus": args.cpus, "files": args.files,
        **({"executors": args.executors,
            "exec_cores": args.exec_cores} if args.executors else {}),
        "statements": m["n_statements"], "walls_s": walls,
        "statements_per_sec": round(m["n_statements"] / best, 1),
        "stages": stages[walls.index(best)],
    }))
    shutil.rmtree(scratch, ignore_errors=True)


if __name__ == "__main__":
    main()
