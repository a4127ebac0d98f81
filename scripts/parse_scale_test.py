"""Pinned parse-only scaling check (warmup + 2 timed runs)."""
import argparse, json, os, sys, time

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

    spark = get_spark(cores=args.cpus, app_name="parse-scale")
    profile = CorpusProfile(n_files=args.files, statements_per_file=args.stmts,
                            error_rate=0.005)
    src = P.with_file_sha(corpus_spark(spark, profile)).persist()
    src.count()

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    runs = []
    for i in range(3):
        t0 = time.time()
        noop(P.parse_sources(src))
        runs.append(round(time.time() - t0, 2))
    print(json.dumps({"cpus": args.cpus, "runs": runs}))


if __name__ == "__main__":
    main()
