"""Warmed full-pipeline scaling measurement at one core count."""
import argparse, json, os, shutil, sys, tempfile, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, required=True)
    ap.add_argument("--files", type=int, default=20000)
    ap.add_argument("--stmts", type=int, default=250)
    ap.add_argument("--warm-files", type=int, default=1000)
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
    spark = get_spark(cores=args.cpus, app_name="pipe-scale", extra={
        "spark.local.dir": os.path.join(scratch, "local"),
    })

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
        "statements": m["n_statements"], "walls_s": walls,
        "statements_per_sec": round(m["n_statements"] / best, 1),
        "stages": stages[walls.index(best)],
    }))
    shutil.rmtree(scratch, ignore_errors=True)


if __name__ == "__main__":
    main()
