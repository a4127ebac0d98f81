"""Isolate parse-stage scaling: gen-only / gen+parse / +parquet write."""
import argparse, json, os, shutil, sys, tempfile, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, required=True)
    ap.add_argument("--files", type=int, default=4000)
    ap.add_argument("--stmts", type=int, default=100)
    ap.add_argument("--phases", default="gen,parse,write")
    args = ap.parse_args()

    from ebel_spark.session import get_spark
    from ebel_spark.corpus import CorpusProfile, corpus_spark
    from ebel_spark import parse as P

    spark = get_spark(cores=args.cpus, app_name="parse-profile")
    spark.range(1).count()
    profile = CorpusProfile(n_files=args.files, statements_per_file=args.stmts,
                            error_rate=0.005)
    out = {"cpus": args.cpus}
    phases = args.phases.split(",")

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    if "gen" in phases:
        t0 = time.time()
        noop(corpus_spark(spark, profile))
        out["gen_s"] = round(time.time() - t0, 2)

    if "parse" in phases:
        src = P.with_file_sha(corpus_spark(spark, profile))
        t0 = time.time()
        noop(P.parse_sources(src))
        out["gen_parse_s"] = round(time.time() - t0, 2)

    if "write" in phases:
        d = tempfile.mkdtemp(prefix="pp_")
        try:
            src = P.with_file_sha(corpus_spark(spark, profile))
            t0 = time.time()
            P.parse_sources(src).write.mode("overwrite").parquet(
                os.path.join(d, "parsed"))
            out["gen_parse_write_s"] = round(time.time() - t0, 2)
        finally:
            shutil.rmtree(d, ignore_errors=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
