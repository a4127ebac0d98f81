"""Micro-profile of the materialize/rollup stages at one core count."""
import argparse, json, os, shutil, sys, tempfile, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, required=True)
    ap.add_argument("--files", type=int, default=20000)
    ap.add_argument("--stmts", type=int, default=250)
    args = ap.parse_args()

    from ebel_spark.session import get_spark
    from ebel_spark.corpus import CorpusProfile, corpus_spark
    from ebel_spark import parse as P, graph as G

    spark = get_spark(cores=args.cpus, app_name="mat-profile")
    d = tempfile.mkdtemp(prefix="mp_")
    out = {"cpus": args.cpus}

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def t(name, fn):
        t0 = time.time()
        r = fn()
        out[name] = round(time.time() - t0, 2)
        return r

    try:
        profile = CorpusProfile(n_files=args.files,
                                statements_per_file=args.stmts,
                                error_rate=0.005)
        src = P.with_file_sha(corpus_spark(spark, profile))
        # warm parse on small corpus
        warm = P.with_file_sha(corpus_spark(
            spark, CorpusProfile(n_files=500, statements_per_file=100)))
        noop(P.parse_sources(warm))

        pp = os.path.join(d, "parsed")
        t("parse_write", lambda: P.parse_sources(src).write.parquet(pp))
        parsed = spark.read.parquet(pp)
        valid_files = parsed.filter("ok").select("file_sha")

        statements = P.statements_table(parsed)
        nodes_raw = P.nodes_table(parsed)
        child_raw = P.child_edges_table(parsed)

        t("explode_stmts_noop", lambda: noop(statements))
        st_valid = statements.join(valid_files, "file_sha", "left_semi")
        t("mat_nodes_noop", lambda: noop(G.materialize_nodes(
            nodes_raw.join(valid_files, "file_sha", "left_semi"))))
        t("mat_edges_noop", lambda: noop(G.materialize_edges(st_valid)))
        t("struct_edges_noop", lambda: noop(G.materialize_structural_edges(
            child_raw.join(valid_files, "file_sha", "left_semi"))))

        # checkpointed variants (parquet write)
        def ck(df, name):
            p = os.path.join(d, name)
            df.write.mode("overwrite").parquet(p)
            return spark.read.parquet(p)

        nodes = t("mat_nodes_write", lambda: ck(G.materialize_nodes(
            nodes_raw.join(valid_files, "file_sha", "left_semi")), "nodes0"))
        edges_stmt = t("mat_edges_write", lambda: ck(
            G.materialize_edges(st_valid), "edges_stmt"))
        struct_edges = t("struct_write", lambda: ck(
            G.materialize_structural_edges(
                child_raw.join(valid_files, "file_sha", "left_semi")),
            "struct"))
        t("p2g_noop", lambda: [noop(x) for x in
                               G.protein2gene(nodes, edges_stmt)])
        closure = t("closure_persist", lambda: G.descendant_closure(
            struct_edges, G.INVOLVED_GENES_EDGES).persist())
        t("closure_count", lambda: closure.count())
        t("involved_noop", lambda: noop(G.involved_rollup(
            nodes, struct_edges, genes_closure=closure)))
        t("species_noop", lambda: noop(G.species_tagging(
            nodes, struct_edges,
            edges_stmt, genes_closure=closure)))
    finally:
        shutil.rmtree(d, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
