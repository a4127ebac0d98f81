"""BEL 2.1 language vocabulary tables.

These are *facts of the BEL 2.1 language* as implemented by the reference
(e-bel/ebel). Citations into the reference for parity checking:

- function long/short names:        /root/reference/ebel/grammar/grammar_bel_2_1.bnf:488-499
- relations + symbols:              grammar_bel_2_1.bnf:520-609
- pmod type vocabulary:             grammar_bel_2_1.bnf:616-651
- amino-acid codes:                 grammar_bel_2_1.bnf:432-453
- ma() default activities:          grammar_bel_2_1.bnf:198-216
- canonical short function names:   /root/reference/ebel/manager/orientdb/odb_defaults.py:45-75
- normalized pmod codes:            odb_defaults.py:77-113
- node class hierarchy:             /root/reference/ebel/manager/orientdb/odb_structure.py:159-347
- relation categories:              odb_structure.py:349-418
- species namespaces:               /root/reference/ebel/constants.py:107-112
"""

from __future__ import annotations

# ---------------------------------------------------------------------------
# Abundance / process / transformation functions.
# maps surface spelling -> internal rule name
# ---------------------------------------------------------------------------

FUNC_SPELLINGS: dict[str, str] = {
    "abundance": "abundance", "a": "abundance",
    "geneAbundance": "gene", "g": "gene",
    "microRNAAbundance": "micro_rna", "m": "micro_rna",
    "proteinAbundance": "protein", "p": "protein",
    "rnaAbundance": "rna", "r": "rna",
    "populationAbundance": "population", "pop": "population",
    "complexAbundance": "complex", "complex": "complex",
    "compositeAbundance": "composite", "composite": "composite",
    "biologicalProcess": "bp", "bp": "bp",
    "pathology": "path", "path": "path",
    "activity": "act", "act": "act",
    "translocation": "tloc", "tloc": "tloc",
    "cellSecretion": "sec", "sec": "sec",
    "cellSurfaceExpression": "surf", "surf": "surf",
    "degradation": "deg", "deg": "deg",
    "reaction": "rxn", "rxn": "rxn",
    "list": "list",
}

# modifier function spellings (appear after "," inside abundance terms)
MOD_SPELLINGS: dict[str, str] = {
    "proteinModification": "pmod", "pmod": "pmod",
    "variant": "var", "var": "var",
    "fragment": "frag", "frag": "frag",
    "location": "loc", "loc": "loc",
    "geneModification": "gmod", "gmod": "gmod",
}

FUSION_SPELLINGS = ("fusion", "fus")
MA_SPELLINGS = ("molecularActivity", "ma")
FROM_LOC = "fromLoc"
TO_LOC = "toLoc"
REACTANTS = "reactants"
PRODUCTS = "products"

# IR (type, name) pair per internal rule name
# mirrors /root/reference/ebel/transformers.py:124-150,282-323,513-522,649-667
FUNC_IR: dict[str, tuple[str, str]] = {
    "abundance": ("abundance", "abundance"),
    "gene": ("abundance", "gene"),
    "micro_rna": ("abundance", "micro_rna"),
    "rna": ("abundance", "rna"),
    "protein": ("abundance", "protein"),
    "population": ("abundance", "population"),
    "complex_abundance": ("abundance", "complex"),
    "complex_list": ("list", "complex"),
    "composite": ("list", "composite"),
    "bp": ("process", "biological_process"),
    "path": ("process", "pathology"),
    "act": ("process", "activity"),
    "tloc": ("transformation", "translocation"),
    "sec": ("transformation", "cell_secretion"),
    "surf": ("transformation", "cell_surface_expression"),
    "deg": ("transformation", "degradation"),
    "rxn": ("transformation", "reaction"),
    "reactants": ("reaction_partner", "reactants"),
    "products": ("reaction_partner", "products"),
    "from_location": ("translocation", "from_location"),
    "to_location": ("translocation", "to_location"),
    "list": ("list", "list"),
    "gene_fusion": ("other", "fusion_gene"),
    "rna_fusion": ("other", "fusion_rna"),
    "protein_fusion": ("other", "fusion_protein"),
    "pmod": ("modifier", "pmod"),
    "gmod": ("modifier", "gmod"),
    "var": ("modifier", "variant"),
    "frag": ("modifier", "fragment"),
    "loc": ("modifier", "location"),
}

# canonical short function names used when rebuilding BEL strings
# (cf. odb_defaults.py:45-75 `bel_func_short`)
BEL_FUNC_SHORT: dict[str, str] = {
    "gmod": "gmod",
    "protein": "p",
    "abundance": "a",
    "micro_rna": "m",
    "rna": "r",
    "gene": "g",
    "activity": "act",
    "fragment": "frag",
    "pmod": "pmod",
    "location": "loc",
    "variant": "var",
    "complex": "complex",
    "reaction": "rxn",
    "reactants": "reactants",
    "products": "products",
    "pathology": "path",
    "degradation": "deg",
    "biological_process": "bp",
    "list": "list",
    "cell_secretion": "sec",
    "composite": "composite",
    "translocation": "tloc",
    "fusion_protein": "fus",
    "fusion_rna": "fus",
    "fusion_gene": "fus",
    "from_location": "fromLoc",
    "to_location": "toLoc",
    "cell_surface_expression": "surf",
    "population": "pop",
}

# ---------------------------------------------------------------------------
# Relations: surface spelling -> snake_case relation name.
# grammar_bel_2_1.bnf:520-609; snake_case output per transformers.py:326-372
# ---------------------------------------------------------------------------

RELATION_SPELLINGS: dict[str, str] = {
    "increases": "increases", "->": "increases",
    "directlyIncreases": "directly_increases", "=>": "directly_increases",
    "decreases": "decreases", "-|": "decreases",
    "directlyDecreases": "directly_decreases", "=|": "directly_decreases",
    "rateLimitingStepOf": "rate_limiting_step_of",
    "causesNoChange": "causes_no_change", "cnc": "causes_no_change",
    "regulates": "regulates", "reg": "regulates",
    "negativeCorrelation": "negative_correlation", "neg": "negative_correlation",
    "positiveCorrelation": "positive_correlation", "pos": "positive_correlation",
    "association": "association", "--": "association",
    "noCorrelation": "no_correlation", "no": "no_correlation",
    "orthologous": "orthologous",
    "transcribedTo": "transcribed_to", ":>": "transcribed_to",
    "translatedTo": "translated_to", ">>": "translated_to",
    "hasMember": "has_member",
    "hasMembers": "has_members",
    "hasComponent": "has_component",
    "hasComponents": "has_components",
    "isA": "is_a",
    "subProcessOf": "sub_process_of",
    "equivalentTo": "equivalent_to", "eq": "equivalent_to",
    "analogousTo": "analogous_to",
    "biomarkerFor": "biomarker_for",
    "prognosticBiomarkerFor": "prognostic_biomarker_for",
    "actsIn": "acts_in",
    "hasProduct": "has_product",
    "hasVariant": "has_variant",
    "hasModification": "has_modification",
    "reactantIn": "reactant_in",
    "translocates": "translocates",
    "includes": "includes",
}

# relations legal inside `relation_basic` (generic subject/object)
RELATION_BASIC: frozenset[str] = frozenset({
    "increases", "directly_increases", "decreases", "directly_decreases",
    "causes_no_change", "regulates", "negative_correlation",
    "positive_correlation", "association", "no_correlation", "has_member",
    "is_a", "equivalent_to", "acts_in", "has_product", "has_variant",
    "has_modification", "reactant_in", "translocates", "includes",
})

# relations with typed subject/object (grammar statement alternatives,
# grammar_bel_2_1.bnf:47-73)
RELATION_BIOMARKER = frozenset({"biomarker_for", "prognostic_biomarker_for"})
RELATION_PROCESS = frozenset({"sub_process_of", "rate_limiting_step_of"})

RELATION_CATEGORY: dict[str, str] = {
    "increases": "causal", "directly_increases": "causal",
    "decreases": "causal", "directly_decreases": "causal",
    "rate_limiting_step_of": "causal", "causes_no_change": "causal",
    "regulates": "causal",
    "negative_correlation": "correlative", "positive_correlation": "correlative",
    "association": "correlative", "no_correlation": "correlative",
    "orthologous": "genomic", "transcribed_to": "genomic",
    "translated_to": "genomic",
    "has_member": "other", "has_members": "other", "has_component": "other",
    "has_components": "other", "equivalent_to": "other", "is_a": "other",
    "sub_process_of": "other",
    "analogous_to": "deprecated", "biomarker_for": "deprecated",
    "prognostic_biomarker_for": "deprecated",
    "acts_in": "compiler", "has_product": "compiler", "has_variant": "compiler",
    "has_modification": "compiler", "reactant_in": "compiler",
    "translocates": "compiler", "includes": "compiler",
}

# ---------------------------------------------------------------------------
# pmod types: surface spelling (quoted variants included) -> 3-letter code
# grammar_bel_2_1.bnf:616-651 (rule names are the codes)
# ---------------------------------------------------------------------------


def _q(s: str) -> str:
    return '"' + s + '"'


_PMOD_DEFS: dict[str, tuple[str, ...]] = {
    # code -> unquoted spellings (quoted variants are added below)
    "ace": ("Ac", "acetylation"),
    "adr": ("ADPRib",),
    "far": ("Farn", "farnesylation"),
    "ger": ("Gerger", "geranylgeranylation"),
    "gly": ("Glyco", "glycosylation"),
    "hyd": ("Hy", "hydroxylation"),
    "isg": ("ISG", "ISGylation"),
    "me0": ("Me",),
    "me1": ("methylation", "Me1"),
    "mon": ("monomethylation", "mono-methylation"),
    "me2": ("Me2", "dimethylation"),
    "me3": ("di-methylation", "Me3"),
    "tri": ("trimethylation", "tri-methylation"),
    "myr": ("Myr", "myristoylation"),
    "ned": ("Nedd", "neddylation"),
    "ngl": ("NGlyco",),
    "nit": ("NO", "Nitrosylation"),
    "ogl": ("OGlyco",),
    "pal": ("Palm", "palmitoylation"),
    "pho": ("Ph", "phosphorylation"),
    "sul": ("Sulf", "sulfation"),
    "sup": ("sulphation",),
    "suh": ("sulfonation",),
    "sum": ("sulphonation",),
    "suy": ("SUMOylation", "Sumo"),
    "ubi": ("Ub", "ubiquitination", "ubiquitinylation", "ubiquitylation"),
    "u48": ("UbK48",),
    "u63": ("UbK63",),
    "ubm": ("UbMono", "monoubiquitination"),
    "ubp": ("UbPoly", "polyubiquitination"),
    "add": ("ADP-rybosylation",),
}

# quoted-only spellings per grammar
_PMOD_QUOTED_EXTRA: dict[str, tuple[str, ...]] = {
    "adr": ("ADP-ribosylation",),
    "add": ("adenosine diphosphoribosyl",),
    "me0": ("ISG15-protein conjugation",),
    "ngl": ("N-linked glycosylation",),
    "ogl": ("O-linked glycosylation",),
    "sup": ("sulfur addition",),
    "suh": ("sulphur addition",),
    "u48": ("Lysine 48-linked polyubiquitination",),
    "u63": ("Lysine 63-linked polyubiquitination",),
}

#: unquoted pmod spelling -> code
PMOD_UNQUOTED: dict[str, str] = {}
#: quoted pmod spelling (inner text, without quotes) -> code
PMOD_QUOTED: dict[str, str] = {}
for _code, _spellings in _PMOD_DEFS.items():
    for _sp in _spellings:
        PMOD_UNQUOTED[_sp] = _code
        PMOD_QUOTED[_sp] = _code
for _code, _spellings in _PMOD_QUOTED_EXTRA.items():
    for _sp in _spellings:
        PMOD_QUOTED[_sp] = _code

# canonical short representation per code (odb_defaults.py:77-113)
NORMALIZED_PMOD: dict[str, str] = {
    "ace": "Ac", "adr": "ADPRib", "add": '"ADP-rybosylation"', "far": "Farn",
    "ger": "Gerger", "gly": "Glyco", "hyd": "Hy", "isg": "ISG", "me0": "Me",
    "me1": "Me1", "mon": "monomethylation", "me2": "Me2", "me3": "Me3",
    "tri": "trimethylation", "myr": "Myr", "ned": "Nedd", "ngl": "NGlyco",
    "nit": "NO", "ogl": "OGlyco", "pal": "Palm", "pho": "Ph", "sul": "Sulf",
    "sup": "sulphation", "suh": "sulfonation", "sum": "sulphonation",
    "suy": "Sumo", "ubi": "Ub", "u48": "UbK48", "u63": "UbK63",
    "ubm": "UbMono", "ubp": "UbPoly", "pre": "Prenylation",
    "dei": "de-ISGylation", "fat": "FAT10ylation", "ufm": "Ufmylation",
}

# ---------------------------------------------------------------------------
# amino acids (single and 3 letter) -> single letter code
# grammar_bel_2_1.bnf:432-453; transformer emits upper single letter
# ---------------------------------------------------------------------------

AMINO_ACIDS: dict[str, str] = {}
for _one, _three in (
    ("L", "Leu"), ("E", "Glu"), ("K", "Lys"), ("M", "Met"), ("I", "Ile"),
    ("T", "Thr"), ("D", "Asp"), ("C", "Cys"), ("W", "Trp"), ("V", "Val"),
    ("P", "Pro"), ("H", "His"), ("Q", "Gln"), ("G", "Gly"), ("S", "Ser"),
    ("F", "Phe"), ("Y", "Tyr"), ("N", "Asn"), ("R", "Arg"), ("A", "Ala"),
):
    AMINO_ACIDS[_one] = _one
    AMINO_ACIDS[_three] = _one

# ma() default activities (both spellings -> short rule name)
MA_DEFAULTS: dict[str, str] = {
    "catalyticActivity": "cat", "cat": "cat",
    "chaperoneActivity": "chap", "chap": "chap",
    "gtpBoundActivity": "gtp", "gtp": "gtp",
    "kinaseActivity": "kin", "kin": "kin",
    "peptidaseActivity": "pep", "pep": "pep",
    "phosphataseActivity": "phos", "phos": "phos",
    "ribosylationActivity": "ribo", "ribo": "ribo",
    "transcriptionalActivity": "tscript", "tscript": "tscript",
    "transportActivity": "tport", "tport": "tport",
}

# document properties: surface key -> IR key (grammar_bel_2_1.bnf:332-351)
DOCUMENT_KEYS: dict[str, str] = {
    "Name": "name",
    "Description": "description",
    "Version": "version",
    "Authors": "authors",
    "ContactInfo": "contact_info",
    "Copyright": "copyright",
    "Licenses": "licences",
    "Keywords": "keywords",
}

# ---------------------------------------------------------------------------
# Node class hierarchy: concrete class -> all ancestor classes (including
# itself).  Derived from odb_structure.py:159-347.
# ---------------------------------------------------------------------------

_PARENTS: dict[str, tuple[str, ...]] = {
    "bel": (),
    "nn": (),
    "pure_object": (),
    "location_object": (),
    "ebel": (),
    "bio_object": ("bel",),
    "bio_concept": ("bel",),
    "bio_act": ("bel",),
    "bio_list": ("bel",),
    "genetic_flow": ("bio_object", "nn", "pure_object"),
    "protein": ("genetic_flow", "location_object"),
    "gene": ("genetic_flow", "location_object"),
    "rna": ("genetic_flow", "location_object"),
    "abundance": ("bio_object", "nn", "pure_object"),
    "population": ("bio_object", "nn", "pure_object"),
    "complex": ("bio_object", "nn", "pure_object"),
    "micro_rna": ("bio_object", "nn", "location_object"),
    "biological_process": ("bio_concept", "nn"),
    "pathology": ("bio_concept", "nn"),
    "activity": ("bio_act", "nn"),
    "reaction": ("bio_act",),
    "degradation": ("bio_act",),
    "cell_secretion": ("bio_act",),
    "translocation": ("bio_act",),
    "cell_surface_expression": ("bio_act",),
    "list": ("bio_list",),
    "composite": ("bio_list",),
    "variant": ("ebel",),
    "fragment": ("ebel",),
    "location": ("ebel",),
    "pmod": ("ebel",),
    "gmod": ("ebel",),
    "from_location": ("ebel",),
    "to_location": ("ebel",),
    "reactants": ("ebel",),
    "products": ("ebel",),
    "fusion_protein": ("bel",),
    "fusion_rna": ("bel",),
    "fusion_gene": ("bel",),
}


def _ancestors(cls: str) -> frozenset[str]:
    out = {cls}
    stack = list(_PARENTS.get(cls, ()))
    while stack:
        p = stack.pop()
        if p not in out:
            out.add(p)
            stack.extend(_PARENTS.get(p, ()))
    return frozenset(out)


#: concrete node class -> frozenset of itself + all ancestors
NODE_CLASS_ANCESTORS: dict[str, frozenset[str]] = {c: _ancestors(c) for c in _PARENTS}

#: all node class names (abstract + concrete) in a stable order
ALL_NODE_CLASSES: tuple[str, ...] = tuple(_PARENTS)

# edge class -> ancestors (category rollup), cf. odb_structure.py:349-462
EDGE_CATEGORY_PARENTS: dict[str, str] = dict(RELATION_CATEGORY)
# ebel structural / derived edges
for _e in (
    "has__protein", "has__rna", "has__gene", "has__abundance",
    "has__population", "has__location", "has__from_location",
    "has__to_location", "has__fragment", "has__pmod", "has__gmod",
    "has__complex", "has__micro_rna", "has__variant", "has__reactants",
    "has__products", "has__composite", "has_fragmented_protein",
    "has_modified_protein", "has_modified_gene", "has_variant_gene",
    "has_variant_rna", "has_variant_protein", "has_variant_micro_rna",
    "has_located_gene", "has_located_rna", "has_located_protein",
    "has_located_micro_rna", "has_located_complex", "has_located_abundance",
    "has_located_population",
):
    EDGE_CATEGORY_PARENTS[_e] = "ebel"

SPECIES_NAMESPACE: dict[str, int] = {
    "HGNC": 9606,
    "MGI": 10090,
    "RGD": 10116,
    "FLYBASE": 7227,
}

# classes eligible for pure-tagging (cf. biodbs/bel.py:489-494)
PURE_CLASSES: frozenset[str] = frozenset(
    {"protein", "gene", "rna", "abundance", "complex", "micro_rna"}
)

# traversal edge sets for involved_genes / involved_other rollups
# (cf. biodbs/bel.py:566-584)
INVOLVED_GENES_EDGES: tuple[str, ...] = (
    "has__reactants", "has__products", "has__protein", "has__composite",
    "has__complex", "has__gene", "has__rna",
)
INVOLVED_OTHER_EDGES: tuple[str, ...] = (
    "has__abundance", "has__reactants", "has__products", "has__composite",
    "has__complex",
)
GENE_LIKE_CLASSES: frozenset[str] = frozenset({"protein", "rna", "gene"})
