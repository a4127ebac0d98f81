"""Substage timing: gen / sha / parseUDF / parquet write, at one core count."""
import argparse, json, os, shutil, sys, tempfile, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, required=True)
    ap.add_argument("--files", type=int, default=10000)
    ap.add_argument("--stmts", type=int, default=250)
    args = ap.parse_args()

    from ebel_spark.session import get_spark
    from ebel_spark.corpus import CorpusProfile, corpus_spark
    from ebel_spark import parse as P

    spark = get_spark(cores=args.cpus, app_name="stage-profile")
    spark.range(1).count()
    profile = CorpusProfile(n_files=args.files, statements_per_file=args.stmts,
                            error_rate=0.005)
    out = {"cpus": args.cpus}

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    t0 = time.time()
    src = corpus_spark(spark, profile).persist()
    n = src.count()
    out["gen_persist_s"] = round(time.time() - t0, 2)

    t0 = time.time()
    noop(P.with_file_sha(src))
    out["sha_s"] = round(time.time() - t0, 2)

    src_sha = P.with_file_sha(src)
    t0 = time.time()
    noop(P.parse_sources(src_sha))
    out["parse_noop_s"] = round(time.time() - t0, 2)

    d = tempfile.mkdtemp(prefix="sp_")
    try:
        t0 = time.time()
        P.parse_sources(src_sha).write.mode("overwrite").parquet(
            os.path.join(d, "parsed"))
        out["parse_write_s"] = round(time.time() - t0, 2)
        sz = sum(os.path.getsize(os.path.join(r, f))
                 for r, _, fs in os.walk(d) for f in fs)
        out["parsed_bytes"] = sz
    finally:
        shutil.rmtree(d, ignore_errors=True)
    out["files"] = n
    print(json.dumps(out))


if __name__ == "__main__":
    main()
