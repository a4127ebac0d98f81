"""Deterministic synthetic BEL source-file corpus.

Generates rows shaped like the BASELINE.json input table
`(repo, path, commit, lang, content)`.  Generation is distributed
(spark.range -> mapInPandas) and a pure function of (file_id, profile,
seed), so any scale regenerates identically — no data files shipped.

The statement mix is drawn from the reference fixture vocabulary with an
HGNC-heavy, Zipf-skewed gene distribution (FIXTURES.md §1): ~70% of entries
hit HGNC and a handful of hot genes dominate, exercising the skew handling
(salted aggregations + AQE) the north rule asks for.
"""

from __future__ import annotations

import hashlib
import random
from typing import Iterator

import pandas as pd

from .namespaces import Dimensions, build_dimensions

_RELATIONS = [
    ("increases", 30), ("decreases", 20), ("directlyIncreases", 12),
    ("directlyDecreases", 8), ("positiveCorrelation", 10),
    ("negativeCorrelation", 5), ("association", 5), ("regulates", 4),
    ("causesNoChange", 2), ("isA", 2), ("hasMember", 1), ("eq", 1),
]
_REL_CHOICES = [r for r, w in _RELATIONS for _ in range(w)]

_PMOD_TYPES = ["Ph", "Ac", "Me", "Ub", "Sumo", "Glyco"]
_AA = ["S", "T", "Y", "K", "R"]

HEADER_NAMESPACES = [
    ("HGNC", "https://example.org/ns/hgnc.belns"),
    ("CHEBI", "https://example.org/ns/chebi.belns"),
    ("GOBP", "https://example.org/ns/gobp.belns"),
    ("GOCC", "https://example.org/ns/gocc.belns"),
    ("MESHA", "https://example.org/ns/mesha.belns"),
    ("MESHD", "https://example.org/ns/meshd.belns"),
    ("SCOMP", "https://example.org/ns/scomp.belns"),
    ("MGI", "https://example.org/ns/mgi.belns"),
]


class CorpusProfile:
    def __init__(
        self,
        n_files: int = 100,
        statements_per_file: int = 50,
        error_rate: float = 0.03,     # fraction of FILES with syntax errors
        miss_rate: float = 0.03,      # per-statement dictionary-miss rate
        hot_fraction: float = 0.5,
        n_hot_genes: int = 12,
        seed: int = 42,
    ):
        self.n_files = n_files
        self.statements_per_file = statements_per_file
        self.error_rate = error_rate
        self.miss_rate = miss_rate
        self.hot_fraction = hot_fraction
        self.n_hot_genes = n_hot_genes
        self.seed = seed


SMALL = CorpusProfile(n_files=100, statements_per_file=50)
BENCH = CorpusProfile(n_files=2000, statements_per_file=200)


class _Vocab:
    """Pickle-cheap vocabulary snapshot shipped to executors."""

    def __init__(self, dims: Dimensions, profile: CorpusProfile):
        ns = dims.namespace_entries
        self.hgnc = ns[ns.keyword == "HGNC"].name.tolist()
        self.chebi = ns[ns.keyword == "CHEBI"].name.tolist()
        self.gobp = ns[ns.keyword == "GOBP"].name.tolist()
        self.gocc = ns[ns.keyword == "GOCC"].name.tolist()
        self.mesha = ns[ns.keyword == "MESHA"].name.tolist()
        self.meshd = ns[ns.keyword == "MESHD"].name.tolist()
        self.scomp = ns[ns.keyword == "SCOMP"].name.tolist()
        self.mgi = ns[ns.keyword == "MGI"].name.tolist()
        self.anno = {
            kw: g.name.tolist()
            for kw, g in dims.annotation_entries.groupby("keyword")
        }
        self.missing = dims.missing
        self.hot_genes = self.hgnc[: profile.n_hot_genes]


def _q(name: str) -> str:
    """Quote a name when BEL requires it (whitespace/comma/parens)."""
    if any(c in name for c in ' ,()"'):
        return '"' + name + '"'
    return name


def _gene(rng: random.Random, v: _Vocab, p: CorpusProfile) -> str:
    """HGNC-skewed gene pick: hot head + long tail (Zipf-ish)."""
    if rng.random() < p.hot_fraction:
        return rng.choice(v.hot_genes)
    return rng.choice(v.hgnc)


def _term(rng: random.Random, v: _Vocab, p: CorpusProfile, depth: int = 0) -> str:
    r = rng.random()
    if r < 0.02 and rng.random() < p.miss_rate * 10:
        pass  # fallthrough keeps distribution stable
    if r < 0.45:
        g = _gene(rng, v, p)
        mods = ""
        mr = rng.random()
        if mr < 0.15:
            t = rng.choice(_PMOD_TYPES)
            if rng.random() < 0.5:
                mods = f", pmod({t}, {rng.choice(_AA)}, {rng.randint(1, 900)})"
            else:
                mods = f", pmod({t})"
        elif mr < 0.20:
            mods = f', var("p.Gly{rng.randint(10, 500)}Ala")'
        elif mr < 0.23:
            mods = f', loc(MESHA:{_q(rng.choice(v.mesha))})'
        return f"p(HGNC:{_q(g)}{mods})"
    if r < 0.58:
        return f"r(HGNC:{_q(_gene(rng, v, p))})"
    if r < 0.68:
        return f"g(HGNC:{_q(_gene(rng, v, p))})"
    if r < 0.78:
        return f"a(CHEBI:{_q(rng.choice(v.chebi))})"
    if r < 0.84:
        return f"bp(GOBP:{_q(rng.choice(v.gobp))})"
    if r < 0.88:
        return f"path(MESHD:{_q(rng.choice(v.meshd))})"
    if r < 0.92 and depth == 0:
        return f"act(p(HGNC:{_q(_gene(rng, v, p))}), ma(kin))"
    if r < 0.95 and depth == 0:
        inner = ", ".join(
            sorted({f"p(HGNC:{_q(_gene(rng, v, p))})" for _ in range(2)})
        )
        return f"complex({inner})"
    if r < 0.97 and depth == 0:
        return f"complex(SCOMP:{_q(rng.choice(v.scomp))})"
    if r < 0.99 and depth == 0:
        return (f"deg(p(HGNC:{_q(_gene(rng, v, p))}))")
    return f"m(HGNC:{_q(_gene(rng, v, p))})"


def make_bel_file(file_id: int, v: _Vocab, p: CorpusProfile) -> str:
    rng = random.Random((p.seed << 32) ^ file_id)
    # syntax errors are injected per FILE (the file is the reference's unit
    # of acceptance): `error_rate` of files carry 1-2 bad statements
    file_has_errors = rng.random() < p.error_rate
    error_slots = set()
    if file_has_errors:
        total = p.statements_per_file
        error_slots = {rng.randrange(total) for _ in range(rng.randint(1, 2))}
    lines = [
        'SET DOCUMENT Name = "synthetic-%06d.bel"' % file_id,
        'SET DOCUMENT Version = "1.0.%d"' % (file_id % 100),
        'SET DOCUMENT Authors = "Corpus Generator"',
        'SET DOCUMENT Description = "Deterministic synthetic BEL corpus"',
        "",
    ]
    for kw, url in HEADER_NAMESPACES:
        lines.append(f'DEFINE NAMESPACE {kw} AS URL "{url}"')
    lines.append('DEFINE NAMESPACE dbSNP AS PATTERN "rs[0-9]+"')
    lines.append(
        'DEFINE ANNOTATION Cells AS LIST {"astrocyte", "microglia", "neuron"}')
    if file_id % 17 == 0:
        # a repeated definition so the multiple-definition warning family
        # has real data (identical value list -> semantics unchanged);
        # deterministic branch keeps the rng stream identical either way
        lines.append(
            'DEFINE ANNOTATION Cells AS LIST '
            '{"astrocyte", "microglia", "neuron"}')
    lines.append('DEFINE ANNOTATION Tissue AS URL '
                 '"https://example.org/anno/tissue.belanno"')
    lines.append("")

    n_blocks = max(1, p.statements_per_file // 10)
    stmts_left = p.statements_per_file
    stmt_no = 0
    for b in range(n_blocks):
        pmid = 10_000_000 + (file_id * 97 + b * 13) % 5_000_000
        # half the blocks carry the 6-field citation with a pub_date so the
        # publication-year statistics have real data; deterministic parity
        # check (not rng) keeps the rng stream unchanged either way
        if (file_id + b) % 2 == 0:
            year = 2005 + (file_id * 7 + b * 3) % 20
            lines.append(
                'SET Citation = {"PubMed", "Synthetic journal %d", "%d", '
                '"%d-%02d-01", "Author A|Author B", ""}'
                % (b, pmid, year, b % 12 + 1))
        else:
            lines.append(
                'SET Citation = {"PubMed", "Synthetic journal %d", "%d"}'
                % (b, pmid))
        lines.append('SET Evidence = "Synthetic evidence text %d for file %d."'
                     % (b, file_id))
        if rng.random() < 0.7:
            lines.append('SET Cells = "%s"' % rng.choice(v.anno["Cells"]))
        if rng.random() < 0.3:
            lines.append('SET Tissue = "%s"' % rng.choice(v.anno["Tissue"]))
        n = min(stmts_left, 10)
        stmts_left -= n
        for _ in range(n):
            stmt_no += 1
            roll = rng.random()
            if (stmt_no - 1) in error_slots:
                lines.append("# Return False")
                lines.append("p(HGNC:%s -> r(HGNC:%s)"  # missing paren
                             % (_gene(rng, v, p), _gene(rng, v, p)))
                continue
            if roll < p.miss_rate:
                kw = rng.choice(["HGNC", "CHEBI", "GOBP"])
                bad = rng.choice(v.missing[kw])
                fn = {"HGNC": "p", "CHEBI": "a", "GOBP": "bp"}[kw]
                lines.append(f"{fn}({kw}:{_q(bad)}) -> p(HGNC:{_q(_gene(rng, v, p))})")
                continue
            subj = _term(rng, v, p)
            if rng.random() < 0.08:
                lines.append(subj)  # subject-only statement
            else:
                rel = rng.choice(_REL_CHOICES)
                obj = _term(rng, v, p)
                lines.append(f"{subj} {rel} {obj}")
        if rng.random() < 0.5:
            lines.append("UNSET Cells")
        lines.append("")
    if file_id % 13 == 0:
        # an orthologous pair whose MGI symbol is the title-cased HGNC one:
        # the same lower-cased entry under two namespace keywords, feeding
        # the AlsoUsedInOtherNamespace warning family with real rows
        # (deterministic branch: rng stream unchanged)
        hot = v.hot_genes[file_id % len(v.hot_genes)]
        lines.append('SET Citation = {"PubMed", "Ortho", "99%05d"}'
                     % (file_id % 100000))
        lines.append(f"g(HGNC:{_q(hot)}) orthologous "
                     f"g(MGI:{_q(hot.title())})")
        lines.append("")
    return "\n".join(lines) + "\n"


def corpus_spark(spark, profile: CorpusProfile, dims: Dimensions | None = None,
                 partitions: int | None = None):
    """Distributed corpus generation -> DataFrame(repo, path, commit, lang,
    content)."""
    from pyspark.sql import functions as F  # noqa: N812

    if dims is None:
        dims = build_dimensions(seed=profile.seed)
    v = _Vocab(dims, profile)
    parts = partitions or spark.sparkContext.defaultParallelism

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"repo": [], "path": [], "commit": [], "lang": [],
                    "content": []}
            for fid in pdf["id"]:
                fid = int(fid)
                content = make_bel_file(fid, v, profile)
                rows["repo"].append("synthetic/corpus-%03d" % (fid % 50))
                rows["path"].append("docs/synthetic-%06d.bel" % fid)
                rows["commit"].append(
                    hashlib.sha1(b"commit-%d" % fid).hexdigest())
                rows["lang"].append("bel")
                rows["content"].append(content)
            yield pd.DataFrame(rows)

    from .schemas import SOURCE_SCHEMA
    return (
        spark.range(0, profile.n_files, 1, parts)
        .mapInPandas(gen, SOURCE_SCHEMA)
    )


def corpus_pandas(profile: CorpusProfile, dims: Dimensions | None = None) -> pd.DataFrame:
    """Driver-side corpus for small tests."""
    if dims is None:
        dims = build_dimensions(seed=profile.seed)
    v = _Vocab(dims, profile)
    rows = []
    for fid in range(profile.n_files):
        rows.append((
            "synthetic/corpus-%03d" % (fid % 50),
            "docs/synthetic-%06d.bel" % fid,
            hashlib.sha1(b"commit-%d" % fid).hexdigest(),
            "bel",
            make_bel_file(fid, v, profile),
        ))
    return pd.DataFrame(rows, columns=["repo", "path", "commit", "lang",
                                       "content"])
