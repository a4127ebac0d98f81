"""Distributed namespace/annotation validation.

Re-expresses the reference's per-entry Python/SQL probes
(/root/reference/ebel/transformers.py:959-1128, ebel/manager/models.py:163-237)
as DataFrame joins:

- undefined keyword        -> left-anti join entries vs definitions
- LIST membership          -> join + array_contains
- PATTERN match            -> join + per-row RLIKE against the pattern column
- URL dictionary lookup    -> broadcast-hash left-anti join on (keyword, name),
                              then a broadcast suggestion join for hints
                              (exact match in other namespaces, else prefix
                              similarity, else an OLS search URL —
                              models.py:204-233)

All error rows match the reference report columns
(/root/reference/ebel/validate.py:273-281).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

_REPORT_COLS = [
    "file_sha", "error_class", "url", "keyword", "entry",
    "line_number", "column", "hint",
]


def _report(df: DataFrame, error_class_col) -> DataFrame:
    return df.select(
        "file_sha",
        error_class_col.alias("error_class"),
        F.col("url").cast("string").alias("url"),
        "keyword",
        F.regexp_replace("entry", "[\n\r]", "").alias("entry"),
        F.col("line").alias("line_number"),
        F.col("col").alias("column"),
        F.col("hint").cast("string").alias("hint"),
    )


def _cls(kind_col, ns_name: str, anno_name: str):
    return F.when(kind_col == "ns", F.lit(ns_name)).otherwise(F.lit(anno_name))


def undefined_keyword_errors(entries: DataFrame, defs: DataFrame) -> DataFrame:
    """WithoutDefinedNamespace / WithoutDefinedAnnotation
    (transformers.py:1019-1051)."""
    missing = entries.join(
        defs.select("file_sha", "kind", "keyword").distinct(),
        ["file_sha", "kind", "keyword"],
        "left_anti",
    )
    missing = missing.withColumn("url", F.lit(None)).withColumn("hint", F.lit(None))
    return _report(
        missing,
        _cls(F.col("kind"), "WithoutDefinedNamespace", "WithoutDefinedAnnotation"),
    )


def list_membership_errors(entries: DataFrame, defs: DataFrame) -> DataFrame:
    """NotInNamespaceList / NotInAnnotationList (transformers.py:991-1017)."""
    list_defs = defs.filter(F.col("def_type") == "LIST").select(
        "file_sha", "kind", "keyword", "value_list"
    )
    joined = entries.join(list_defs, ["file_sha", "kind", "keyword"])
    bad = joined.filter(~F.array_contains("value_list", F.col("entry")))
    bad = bad.withColumn("url", F.lit(None)).withColumn("hint", F.lit(None))
    return _report(
        bad, _cls(F.col("kind"), "NotInNamespaceList", "NotInAnnotationList")
    )


def pattern_errors(entries: DataFrame, defs: DataFrame) -> DataFrame:
    """NotInNamespacePattern / NotInAnnotationPattern
    (transformers.py:959-989: search with '^'+regex+'$').

    Per-file containment: the reference re.compile simply raises on a
    malformed PATTERN (it validates one file per process); in a corpus
    job one bad regex must not fail the executor task 4 times and kill
    the whole run.  Distinct pattern strings (vocabulary-sized, like the
    reference's definitions table) are pre-compiled driver-side against
    the SAME java.util.regex engine rlike uses; entries under an invalid
    pattern are reported as pattern errors with an explanatory hint
    instead of being evaluated."""
    pat_defs = defs.filter(F.col("def_type") == "PATTERN").select(
        "file_sha", "kind", "keyword", F.col("value").alias("pattern")
    )
    joined = entries.join(pat_defs, ["file_sha", "kind", "keyword"])

    spark = entries.sparkSession
    jvm = spark.sparkContext._jvm
    invalid = []
    for r in pat_defs.select("pattern").distinct().collect():
        try:
            jvm.java.util.regex.Pattern.compile(r.pattern)
        except Exception:
            invalid.append(r.pattern)

    checkable = joined
    broken = None
    if invalid:
        checkable = joined.filter(~F.col("pattern").isin(invalid))
        broken = (
            joined.filter(F.col("pattern").isin(invalid))
            .withColumn("url", F.lit(None))
            .withColumn("hint", F.concat(
                F.lit("invalid PATTERN regex: "), F.col("pattern")))
        )
    bad = checkable.filter(
        ~F.expr("entry rlike concat('^', pattern, '$')")
    )
    bad = bad.withColumn("url", F.lit(None)).withColumn("hint", F.lit(None))
    if broken is not None:
        bad = bad.unionByName(broken)
    return _report(
        bad, _cls(F.col("kind"), "NotInNamespacePattern", "NotInAnnotationPattern")
    )


def _ols_hint(entry_col):
    # models.py:233-235: urlencode({'q': entry}, quote_via=quote_plus).
    # F.url_encode IS application/x-www-form-urlencoded (space -> +,
    # every reserved char percent-escaped), so entries with +/&/()/'
    # (CHEBI names have them) produce a correct search URL.
    return F.concat(
        F.lit("[OLS suggests](https://www.ebi.ac.uk/ols/search?q="),
        F.url_encode(F.col(entry_col)),
        F.lit(")"),
    )


def url_membership_errors(
    entries: DataFrame,
    defs: DataFrame,
    ns_dict: DataFrame,
    anno_dict: DataFrame,
    with_hints: bool = True,
) -> DataFrame:
    """NotInNamespaceUrl / NotInAnnotationUrl.

    The hot join of the pipeline: every used (keyword, name) occurrence
    against the namespace dictionaries.  Dictionaries are dimension-sized
    (<< broadcast threshold) so this is a broadcast-hash join — no shuffle
    of the big side at all.  Misses are deduplicated to distinct
    (kind, keyword, entry) before the (more expensive) suggestion joins,
    mirroring the reference's per-entry memo caches (models.py:183-235).
    """
    url_defs = defs.filter(F.col("def_type") == "URL").select(
        "file_sha", "kind", "keyword", F.col("value").alias("url")
    )
    used = entries.join(url_defs, ["file_sha", "kind", "keyword"])

    dictionary = (
        ns_dict.select(F.lit("ns").alias("kind"), "keyword", "name")
        .unionByName(
            anno_dict.select(F.lit("anno").alias("kind"), "keyword", "name")
        )
    )

    misses = used.join(
        F.broadcast(dictionary),
        (used.kind == dictionary.kind)
        & (used.keyword == dictionary.keyword)
        & (used.entry == dictionary.name),
        "left_anti",
    )

    if not with_hints:
        out = misses.withColumn("hint", _ols_hint("entry"))
    else:
        # the miss set feeds THREE hint subtrees plus the final join —
        # persist the (tiny, distinct-triple) frame so the hot anti-join
        # above runs once per action, not four times.  ContextCleaner
        # unpersists it once the query's references are gone.
        from pyspark import StorageLevel
        distinct_misses = (
            misses.select("kind", "keyword", "entry").distinct()
            .persist(StorageLevel.MEMORY_AND_DISK)
        )

        # 1) exact-name matches under any keyword (models.py:204-212):
        #    the reference's SQL `name LIKE entry` with no wildcard is a
        #    CASE-INSENSITIVE equality under MySQL/SQLite collation, so
        #    the join compares lowercased names.  (The reference appends
        #    the namespace "(url)" to each alternative; the offline
        #    synthetic dims carry no URL registry, a documented delta.)
        #    Inner join (BroadcastHashJoin); non-matching misses must not
        #    ride through a left join into the groupBy — the final hints
        #    frame left-joins the aggregate back anyway.
        exact = distinct_misses.join(
            F.broadcast(dictionary.select(
                F.col("kind").alias("d_kind"), F.col("keyword").alias("d_kw"),
                F.col("name").alias("d_name"),
            )),
            (F.col("kind") == F.col("d_kind"))
            & (F.lower(F.col("entry")) == F.lower(F.col("d_name"))),
            "inner",
        ).groupBy("kind", "keyword", "entry").agg(
            F.sort_array(F.collect_set(
                F.concat(F.col("d_kw"), F.lit(':"'), F.col("d_name"), F.lit('"'))
            )).alias("alts")
        )

        # 2) prefix similarity for entries >= 6 chars (models.py:216-229):
        #    name LIKE entry[:-2]% and len(name) < len(entry)+3, limit 20.
        #    A raw startswith predicate would plan a BroadcastNestedLoopJoin
        #    (misses x full dictionary — a scale-killer the day a corpus has
        #    millions of distinct unknown entries).  Instead: equi-join on a
        #    fixed 4-char prefix key (valid because entry >= 6 chars means
        #    the LIKE prefix is >= 4 chars, and any d_name starting with it
        #    shares its first 4 chars), then post-filter the exact predicate
        #    inside the hash-bucket — a BroadcastHashJoin.
        pfx = distinct_misses.filter(F.length("entry") >= 6).select(
            "kind", "keyword", "entry",
            F.expr("substring(entry, 1, length(entry) - 2)").alias("pfx"),
            F.length("entry").alias("elen"),
        ).withColumn("p4", F.substring("pfx", 1, 4))
        similars = pfx.join(
            F.broadcast(
                dictionary.filter(F.length("name") >= 4).select(
                    F.col("kind").alias("d_kind"),
                    F.col("keyword").alias("d_kw"),
                    F.col("name").alias("d_name"),
                    F.substring("name", 1, 4).alias("d4"),
                )),
            (F.col("kind") == F.col("d_kind")) & (F.col("p4") == F.col("d4")),
            "inner",
        ).filter(
            F.col("d_name").startswith(F.col("pfx"))
            & (F.length("d_name") < F.col("elen") + 3)
        )
        w = Window.partitionBy("kind", "keyword", "entry").orderBy("d_kw", "d_name")
        similars = (
            similars.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 20)
            .groupBy("kind", "keyword", "entry")
            .agg(F.sort_array(F.collect_set(
                F.concat(F.col("d_kw"), F.lit(':"'), F.col("d_name"), F.lit('"'))
            )).alias("sims"))
        )

        hints = (
            distinct_misses
            .join(exact, ["kind", "keyword", "entry"], "left")
            .join(similars, ["kind", "keyword", "entry"], "left")
            .withColumn(
                "hint",
                F.when(
                    F.size(F.coalesce("alts", F.array())) > 0,
                    F.concat(F.lit("Did you mean: "),
                             F.array_join("alts", ", ")),
                ).when(
                    F.size(F.coalesce("sims", F.array())) > 0,
                    F.concat(F.lit("Similar: "), F.array_join("sims", ", ")),
                ).otherwise(_ols_hint("entry")),
            )
            .select("kind", "keyword", "entry", "hint")
        )
        out = misses.join(F.broadcast(hints), ["kind", "keyword", "entry"], "left")

    return _report(
        out, _cls(F.col("kind"), "NotInNamespaceUrl", "NotInAnnotationUrl")
    )


def ambiguity_warnings(entries: DataFrame) -> DataFrame:
    """AlsoUsedInOtherNamespace warning (transformers.py:913-957): the same
    lower-cased entry appearing under >1 namespace keyword."""
    ns = entries.filter(F.col("kind") == "ns")
    keyword_sets = (
        ns.groupBy("file_sha", F.lower("entry").alias("lentry"))
        .agg(F.collect_set("keyword").alias("keywords"))
        .filter(F.size("keywords") > 1)
    )
    occ = ns.withColumn("lentry", F.lower("entry"))
    amb = occ.join(keyword_sets, ["file_sha", "lentry"])
    amb = amb.withColumn(
        "hint",
        F.concat(
            F.col("entry"), F.lit(" exists also in "),
            F.array_join(
                F.sort_array(F.array_remove("keywords", F.col("keyword"))), ", "
            ),
        ),
    ).withColumn("url", F.lit(None))
    return _report(amb, F.lit("AlsoUsedInOtherNamespace"))


def multiple_definition_report(defs: DataFrame) -> DataFrame:
    """Keywords defined more than once per file (transformers.py:1231-1255)."""
    return (
        defs.groupBy("file_sha", "kind", "keyword")
        .count()
        .filter(F.col("count") > 1)
        .withColumnRenamed("count", "n_definitions")
    )


def write_error_report(errors: DataFrame, path: str) -> str:
    """Reference-format error report (validate.py:252-354): one file whose
    format follows the suffix (.csv/.tsv/.json/.txt), columns matching the
    reference report (error_class, url, keyword, entry, line_number,
    column, hint) with file_sha prepended (our reports span a corpus, the
    reference's span one file).

    Driver-side convenience for human-sized reports — the parquet errors
    table stays the scale path."""
    pdf = errors.select(*_REPORT_COLS).toPandas()
    if path.endswith(".csv"):
        pdf.to_csv(path, index=False)
    elif path.endswith(".tsv"):
        pdf.to_csv(path, sep="\t", index=False)
    elif path.endswith(".json"):
        pdf.to_json(path, orient="records")
    elif path.endswith(".txt"):
        with open(path, "w", encoding="utf-8") as fd:
            fd.write(pdf.to_string(index=False))
    elif path.endswith(".md"):
        with open(path, "w", encoding="utf-8") as fd:
            cols = list(pdf.columns)
            fd.write("| " + " | ".join(cols) + " |\n")
            fd.write("|" + "---|" * len(cols) + "\n")
            for row in pdf.itertuples(index=False):
                cells = ["" if v is None or v != v else
                         str(v).replace("|", "\\|").replace("\n", " ")
                         for v in row]
                fd.write("| " + " | ".join(cells) + " |\n")
    elif path.endswith(".html"):
        with open(path, "w", encoding="utf-8") as fd:
            fd.write(pdf.to_html(index=False, na_rep=""))
    elif path.endswith(".xlsx"):
        # reference validate.py:252-354 defaults to an Excel report; the
        # engine supports it when an xlsx writer is installed (this
        # sandbox ships neither openpyxl nor xlsxwriter)
        try:
            pdf.to_excel(path, index=False)
        except ImportError as exc:
            raise RuntimeError(
                "xlsx reports need openpyxl or xlsxwriter installed; "
                "use .csv/.tsv/.json/.txt/.md/.html here") from exc
    else:
        raise ValueError(f"unsupported report suffix: {path} "
                         "(use .csv/.tsv/.json/.txt/.md/.html/.xlsx)")
    return path


def semantic_errors(
    entries: DataFrame,
    defs: DataFrame,
    ns_dict: DataFrame,
    anno_dict: DataFrame,
    with_hints: bool = True,
) -> DataFrame:
    """All semantic error families unioned, reference report columns."""
    return (
        undefined_keyword_errors(entries, defs)
        .unionByName(url_membership_errors(entries, defs, ns_dict, anno_dict,
                                           with_hints=with_hints))
        .unionByName(list_membership_errors(entries, defs))
        .unionByName(pattern_errors(entries, defs))
    )
