"""Isolate parse-UDF compute vs parsed-parquet write cost at one core count."""
import argparse, json, os, shutil, sys, tempfile, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, required=True)
    ap.add_argument("--files", type=int, default=4000)
    ap.add_argument("--stmts", type=int, default=250)
    ap.add_argument("--codec", default=None)
    args = ap.parse_args()

    from ebel_spark.session import get_spark
    from ebel_spark.corpus import CorpusProfile, corpus_spark
    from ebel_spark import parse as P

    extra = {"spark.local.dir": tempfile.mkdtemp(prefix="pwp_", dir="/dev/shm")}
    if args.codec:
        extra["spark.sql.parquet.compression.codec"] = args.codec
    spark = get_spark(cores=args.cpus, app_name="parse-write-profile",
                      extra=extra)
    profile = CorpusProfile(n_files=args.files, statements_per_file=args.stmts,
                            error_rate=0.005)
    src = P.with_file_sha(corpus_spark(spark, profile)).persist()
    src.count()

    res = {}
    # warmup
    P.parse_sources(src.limit(200)).write.format("noop").mode("overwrite").save()

    t0 = time.time()
    P.parse_sources(src).write.format("noop").mode("overwrite").save()
    res["noop"] = round(time.time() - t0, 2)

    d = tempfile.mkdtemp(prefix="pwp_out_", dir="/dev/shm")
    t0 = time.time()
    P.parse_sources(src).write.mode("overwrite").parquet(d)
    res["write_parquet"] = round(time.time() - t0, 2)
    sz = sum(os.path.getsize(os.path.join(r, f))
             for r, _, fs in os.walk(d) for f in fs)
    res["parquet_mb"] = round(sz / 1e6, 1)

    # read-back cost (downstream consumers re-scan this table)
    t0 = time.time()
    spark.read.parquet(d).write.format("noop").mode("overwrite").save()
    res["read_back"] = round(time.time() - t0, 2)
    shutil.rmtree(d, ignore_errors=True)
    res["cpus"] = args.cpus
    print(json.dumps(res))


if __name__ == "__main__":
    main()
