"""Entity linking & canonicalization via broadcast joins.

Mirrors the reference enrichment passes:
- HGNC symbol + prev-symbol correction:
  /root/reference/ebel/manager/orientdb/biodbs/hgnc.py:265-342
- UniProt accession per (namespace, taxid):  biodbs/uniprot.py:286-367
  ("first accession wins" caveat at uniprot.py:308-309 is made deterministic
  with min-by-accession)
- ChEBI compound ids for pure CHEBI abundances:  biodbs/chebi.py:113-132

All dimension tables are broadcast (dimension-sized) — the fact-side node
table never shuffles.  One deliberate semantic difference vs the reference:
a prev-symbol correction rewrites `name`/`bel` but KEEPS the original
node_id, so edge references stay valid (the reference keeps the OrientDB
@rid for the same reason, hgnc.py:283-289).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from .graph import BIO_OBJECT_CLASSES
from .belc.vocab import GENE_LIKE_CLASSES


_LOCATION_RE = r"^(\d+|X|Y|mitochondria)(?:(?:(p|q)?(\d+))?(?:\.(\d+)))?"


def location_struct_col(loc):
    """Spark twin of the reference HGNC chromosome-location parser
    (hgnc.py:239-253): '19q13.43' -> (chromosome=19, arm=q, region=13,
    band=43); non-matching strings carry `unknown_schema` instead.

    Reference-faithful quirk, kept deliberately: in the reference regex
    (hgnc.py:241) arm/region sit inside an outer optional group whose
    `\\.(band)` part is mandatory, so a BAND-LESS location like '19q13'
    or 'Xq28' yields chromosome only (arm=region=None, verified against
    the reference with re.match).  Parity beats prettiness here — the
    struct must match the reference's stored dict field-for-field."""
    chrom = F.regexp_extract(loc, _LOCATION_RE, 1)
    arm = F.regexp_extract(loc, _LOCATION_RE, 2)
    region = F.regexp_extract(loc, _LOCATION_RE, 3)
    band = F.regexp_extract(loc, _LOCATION_RE, 4)

    def nn(c):
        return F.when(c != "", c)

    return F.when(loc.isNotNull(), F.struct(
        nn(chrom).alias("chromosome"),
        nn(arm).alias("arm"),
        nn(region).cast("int").alias("region"),
        nn(band).cast("int").alias("band"),
        F.when(chrom == "", loc).alias("unknown_schema"),
    ))


def link_hgnc(nodes: DataFrame, hgnc: DataFrame) -> DataFrame:
    """Adds hgnc_symbol / label / location; corrects outdated symbols via
    prev_symbols.  Returns nodes with extra columns:
    hgnc_symbol, label, location, name_corrected (original wrong name)."""
    bio = F.col("node_class").isin(list(BIO_OBJECT_CLASSES))
    is_hgnc = bio & (F.col("namespace") == "HGNC") & F.col("name").isNotNull()

    # one row per symbol, deterministically (a duplicated symbol row in
    # the dim would otherwise fan out fact rows and inflate node counts)
    dw = Window.partitionBy("h_symbol").orderBy("h_label", "h_location")
    dim = (
        hgnc.select(
            F.col("symbol").alias("h_symbol"),
            F.col("label").alias("h_label"),
            F.col("location").alias("h_location"),
        )
        .withColumn("rn", F.row_number().over(dw))
        .filter(F.col("rn") == 1).drop("rn")
    )
    # direct symbol match
    out = nodes.join(
        F.broadcast(dim),
        is_hgnc & (F.col("name") == F.col("h_symbol")),
        "left",
    )

    # prev-symbol correction for HGNC names that matched nothing.  Two
    # current symbols can share a prev symbol (HGNC merges/splits); the
    # min-by-symbol pick makes the correction target deterministic
    # (same standard as link_uniprot's min-by-accession), where a bare
    # dropDuplicates would keep a partition-order-dependent row.
    pw = Window.partitionBy("p_prev").orderBy(
        "p_symbol", "p_label", "p_location")
    prev = (
        hgnc.select(
            F.explode("prev_symbols").alias("p_prev"),
            F.col("symbol").alias("p_symbol"),
            F.col("label").alias("p_label"),
            F.col("location").alias("p_location"),
        )
        .withColumn("rn", F.row_number().over(pw))
        .filter(F.col("rn") == 1).drop("rn")
    )
    # skip corrections whose target symbol is already used by another node
    # (hgnc.py:283-291: "correction only possible if ...")
    existing_names = (
        nodes.filter(is_hgnc).select(F.col("name").alias("used_name")).distinct()
    )
    prev = prev.join(
        existing_names, prev.p_symbol == existing_names.used_name, "left_anti"
    )

    out = out.join(
        F.broadcast(prev),
        is_hgnc & F.col("h_symbol").isNull() & (F.col("name") == F.col("p_prev")),
        "left",
    )

    corrected = F.col("p_symbol").isNotNull()
    out = (
        out
        .withColumn("name_corrected", F.when(corrected, F.col("name")))
        .withColumn(
            "bel",
            F.when(
                corrected,
                # regex-patch the canonical string (hgnc.py:287-288).
                # The name is quoted with \Q...\E (legacy HGNC symbols
                # contain regex metachars like the '.' in NKX2.5, which
                # would otherwise match ANY char) and the replacement's
                # Java group-reference chars ($ and \) are escaped so a
                # symbol is always substituted literally.
                F.regexp_replace(
                    F.col("bel"),
                    F.concat(F.lit('(?<=:")\\Q'), F.col("name"),
                             F.lit('\\E(?=")')),
                    F.regexp_replace(F.col("p_symbol"),
                                     "([\\\\$])", "\\\\$1"),
                ),
            ).otherwise(F.col("bel")),
        )
        .withColumn("name",
                    F.when(corrected, F.col("p_symbol")).otherwise(F.col("name")))
        .withColumn("hgnc_symbol", F.coalesce("h_symbol", "p_symbol"))
        .withColumn("label", F.coalesce("h_label", "p_label"))
        .withColumn(
            "location",
            F.when(F.col("node_class") == "gene",
                   F.coalesce("h_location", "p_location")),
        )
        .drop("h_symbol", "h_label", "h_location",
              "p_prev", "p_symbol", "p_label", "p_location")
        .withColumn("location_struct", location_struct_col(F.col("location")))
    )
    return out


_UNIPROT_NS_TAXID = (("HGNC", 9606), ("MGI", 10090), ("RGD", 10116))


def link_uniprot(nodes: DataFrame, uniprot: DataFrame) -> DataFrame:
    """Adds uniprot accession + recommended-name label to protein nodes."""
    # deterministic "first" accession per (taxid, symbol)
    w = Window.partitionBy("taxid", "gene_symbol").orderBy("accession")
    dim = (
        uniprot.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("gene_symbol").alias("u_symbol"),
            F.col("taxid").alias("u_taxid"),
            F.col("accession").alias("u_accession"),
            F.col("recommended_name").alias("u_recname"),
        )
    )
    ns_taxid = F.create_map(
        *[x for ns, t in _UNIPROT_NS_TAXID for x in (F.lit(ns), F.lit(t))]
    )
    is_protein = F.col("node_class") == "protein"
    by_symbol = (
        is_protein
        & F.col("namespace").isin([ns for ns, _ in _UNIPROT_NS_TAXID])
        & (F.col("name") == F.col("u_symbol"))
        & (F.element_at(ns_taxid, F.col("namespace")) == F.col("u_taxid"))
    )
    out = nodes.join(F.broadcast(dim), by_symbol, "left")

    # UNIPROT namespace: the name IS the accession (uniprot.py:346-367)
    acc_dim = uniprot.select(
        F.col("accession").alias("a_accession"),
        F.col("recommended_name").alias("a_recname"),
        F.col("taxid").alias("a_taxid"),
    ).dropDuplicates(["a_accession"])
    out = out.join(
        F.broadcast(acc_dim),
        is_protein & (F.col("namespace") == "UNIPROT")
        & (F.col("name") == F.col("a_accession")),
        "left",
    )
    return (
        out
        .withColumn("uniprot", F.coalesce("u_accession", "a_accession"))
        .withColumn("uniprot_label", F.coalesce("u_recname", "a_recname"))
        .withColumn("uniprot_taxid", F.coalesce("u_taxid", "a_taxid"))
        .drop("u_symbol", "u_taxid", "u_accession", "u_recname",
              "a_accession", "a_recname", "a_taxid")
    )


def link_chebi(nodes: DataFrame, chebi: DataFrame) -> DataFrame:
    """Adds chebi compound id to pure CHEBI bio_objects (chebi.py:113-132)."""
    dim = chebi.select(
        F.col("name").alias("c_name"), F.col("chebi_id").alias("c_id")
    ).dropDuplicates(["c_name"])
    cond = (
        F.col("node_class").isin(list(BIO_OBJECT_CLASSES))
        & (F.col("namespace") == "CHEBI")
        & F.col("pure")
        & (F.col("name") == F.col("c_name"))
    )
    return (
        nodes.join(F.broadcast(dim), cond, "left")
        .withColumnRenamed("c_id", "chebi")
        .drop("c_name")
    )


def link_all(nodes: DataFrame, hgnc: DataFrame, uniprot: DataFrame,
             chebi: DataFrame) -> DataFrame:
    """HGNC -> UniProt -> ChEBI, in the reference's enrichment order
    (biodbs/bel.py:361-383)."""
    out = link_hgnc(nodes, hgnc)
    out = link_uniprot(out, uniprot)
    out = link_chebi(out, chebi)
    return out


def link_reactome(nodes: DataFrame, reactome: DataFrame) -> DataFrame:
    """Reactome pathway-membership enrichment for pure, uniprot-linked
    protein nodes — the Spark-first re-expression of the reference's
    per-accession OrientDB UPDATE loop (biodbs/reactome.py:77-99: one
    `session.query(distinct(name))` + one `Update protein set
    reactome_pathways = ...` network round-trip PER protein).  Here the
    whole enrichment is ONE broadcast join of the node table against the
    pathway dim on the accession key plus a distinct: the dim is
    bounded (UniProt2Reactome is ~1M rows — executor-memory sized at any
    corpus scale), the node side stays sharded, and hot pathways skew
    only the map side of the distinct's partial aggregation.

    Returns one row per (bel, uniprot, pathway) membership:
    (bel, uniprot, pathway_id, pathway_name, evidence_type).  The
    array-valued node property the reference stores is
    `reactome_node_property` below.
    """
    prot = (
        nodes.filter((F.col("node_class") == "protein")
                     & F.col("pure") & F.col("uniprot").isNotNull())
        .select("bel", "uniprot")
        .distinct()
    )
    dim = reactome.select(
        F.col("uniprot_accession").alias("uniprot"),
        F.col("identifier").alias("pathway_id"),
        F.col("name").alias("pathway_name"),
        "evidence_type",
    ).distinct()
    return prot.join(F.broadcast(dim), "uniprot").select(
        "bel", "uniprot", "pathway_id", "pathway_name", "evidence_type")


def reactome_node_property(memberships: DataFrame) -> DataFrame:
    """Collapse link_reactome rows to the reference's per-node property
    (reactome.py:98: `reactome_pathways = json.dumps([names...])`) —
    deterministically sorted instead of query-order: (bel, uniprot,
    reactome_pathways array<string>)."""
    return (
        memberships.groupBy("bel", "uniprot")
        .agg(F.sort_array(F.collect_set("pathway_name"))
             .alias("reactome_pathways"))
    )


def link_intact(nodes: DataFrame, intact: DataFrame) -> DataFrame:
    """IntAct PPI edge construction between pure, uniprot-linked protein
    nodes — the Spark-first re-expression of the reference's
    per-accession loop (biodbs/intact.py:156-230: one filtered SQL query
    and one `create_edge("has_ppi_ia", ...)` round-trip per interaction
    row).  Here: the interaction dim (~1M rows real-world — broadcast
    sized) joins the node table TWICE on the accession key (subject and
    object endpoint), keeping only interactions with both endpoints in
    the KG, exactly the reference's `if from_rid and to_rid` condition.

    Returns (subject_bel, object_bel, interaction_id, interaction_type,
    detection_method, confidence_value, pmid) edge rows.
    """
    prot = (
        nodes.filter((F.col("node_class") == "protein")
                     & F.col("pure") & F.col("uniprot").isNotNull())
        .select("bel", "uniprot")
        .distinct()
    )
    ia = intact.select(
        "int_a_uniprot_id", "int_b_uniprot_id", "interaction_id",
        "interaction_type", "detection_method", "confidence_value",
        "pmid").distinct()
    a = prot.select(F.col("bel").alias("subject_bel"),
                    F.col("uniprot").alias("int_a_uniprot_id"))
    b = prot.select(F.col("bel").alias("object_bel"),
                    F.col("uniprot").alias("int_b_uniprot_id"))
    # node sides stay sharded; the bounded dim is the broadcast operand
    # on the first hop, and the second hop is a plain shuffle equi-join
    # on the accession key (both sides edge/node sized)
    return (
        a.join(F.broadcast(ia), "int_a_uniprot_id")
        .join(b, "int_b_uniprot_id")
        .select("subject_bel", "object_bel", "interaction_id",
                "interaction_type", "detection_method",
                "confidence_value", F.col("pmid").cast("long").alias("pmid"))
        .distinct()
    )


def snp_gene_map(
    snps: DataFrame,
    ensembl: DataFrame,
    gene_types: tuple = ("mapped", "downstream", "upstream"),
) -> DataFrame:
    """SNP -> gene mapping by chromosomal position — the Spark-first
    re-expression of the reference's per-SNP OrientDB lookups
    (get_set_gene_rids_by_position, odb_meta.py:1309-1363), which runs
    three SQL queries PER SNP:

    - mapped:     every distinct gene whose [start, stop] strictly
                  contains the position (start < pos AND stop > pos)
    - downstream: the single nearest gene starting after the position
                  (ORDER BY start LIMIT 1)
    - upstream:   the single nearest gene ending before the position
                  (ORDER BY stop DESC LIMIT 1)

    Here all SNPs map in ONE pass each: the gene dimension is
    genome-sized (~60k rows for a real ensembl build) so it broadcasts,
    and the nearest-neighbour picks are map-side-combinable
    min(struct(...)) aggregations — no window sort, no per-row driver
    loop.  Ties on start/stop break by symbol ascending (the reference's
    LIMIT 1 is engine-order nondeterministic; we pin it).

    Emits one row per (snp_id, gene_type, symbol) with the pure HGNC
    gene node's bel string, mirroring the reference's
    `g(HGNC:"<symbol>")` node creation.
    """
    s = snps.select("snp_id", "chromosome", "position")
    g = F.broadcast(
        ensembl.select("symbol", F.col("chromosome").alias("g_chrom"),
                       "start", "stop"))
    on_chrom = F.col("chromosome") == F.col("g_chrom")
    parts = []
    if "mapped" in gene_types:
        parts.append(
            s.join(g, on_chrom & (F.col("start") < F.col("position"))
                   & (F.col("stop") > F.col("position")))
            .select("snp_id", F.lit("mapped").alias("gene_type"), "symbol")
            .distinct()
        )
    if "downstream" in gene_types:
        parts.append(
            s.join(g, on_chrom & (F.col("start") > F.col("position")))
            .groupBy("snp_id")
            .agg(F.min(F.struct("start", "symbol")).alias("m"))
            .select("snp_id", F.lit("downstream").alias("gene_type"),
                    F.col("m.symbol").alias("symbol"))
        )
    if "upstream" in gene_types:
        # stop DESC with symbol ASC tie-break == min over (-stop, symbol)
        parts.append(
            s.join(g, on_chrom & (F.col("stop") < F.col("position")))
            .groupBy("snp_id")
            .agg(F.min(F.struct((-F.col("stop")).alias("negstop"),
                                "symbol")).alias("m"))
            .select("snp_id", F.lit("upstream").alias("gene_type"),
                    F.col("m.symbol").alias("symbol"))
        )
    if not parts:
        raise ValueError("gene_types must name at least one mapping")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select(
        "snp_id", "gene_type", "symbol",
        F.concat(F.lit('g(HGNC:"'), F.col("symbol"), F.lit('")')).alias("bel"),
    )
