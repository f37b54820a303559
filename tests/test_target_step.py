from __future__ import annotations

from platform_etl_backend_spark.steps import run_step
from platform_etl_backend_spark.steps.target import (
    ensembl_normalize,
    select_best_non_reference_gene,
)

GENES = [
    # reference gene on chr 1
    ("ENSG001", "protein_coding", "BRCA-ish gene [Source:HGNC Symbol;Acc:HGNC:1]",
     "1", 100, 5000, 1, "SYM1", ["P1"], ["T1"]),
    # same symbol on a patch chromosome -> becomes alternative gene
    ("ENSG002", "protein_coding", "BRCA-ish gene [Source:HGNC]",
     "CHR_PATCH_1", 100, 4000, 1, "SYM1", ["P2"], ["T2"]),
    # symbol with two non-canonical genes: longest elected
    ("ENSG003", "TEC", "odd gene A", "CHR_PATCH_2", 0, 900, -1, "SYM2", ["P3"], None),
    ("ENSG004", "protein_coding", "odd gene B", "CHR_PATCH_3", 0, 500, -1, "SYM2", ["P4"], None),
    # filtered: non-canonical chromosome AND no swissprot
    ("ENSG005", "protein_coding", "dropped", "CHR_PATCH_4", 0, 100, 1, "SYM3", None, None),
    # filtered: not ENSG
    ("LRG_1", "protein_coding", "lrg", "1", 0, 100, 1, "SYM4", None, None),
]

SCHEMA = (
    "id: string, biotype: string, description: string, chromosome: string, "
    "start: long, end: long, strand: int, approvedSymbol: string, "
    "uniprot_swissprot: array<string>, uniprot_trembl: array<string>"
)


def _genes(spark):
    return spark.createDataFrame(GENES, SCHEMA)


def test_ensembl_normalize(spark):
    out = ensembl_normalize(_genes(spark))
    rows = {r.id: r for r in out.collect()}
    assert "LRG_1" not in rows and "ENSG005" not in rows
    assert rows["ENSG001"].approvedName == "BRCA-ish gene"
    assert rows["ENSG003"].biotype == ""  # TEC scrubbed
    assert rows["ENSG001"].genomicLocation.start == 100
    assert rows["ENSG001"].genomicLocation.strand == 1


def test_alt_gene_election(spark):
    out = select_best_non_reference_gene(ensembl_normalize(_genes(spark)))
    rows = {r.id: r for r in out.collect()}
    # canonical-chromosome gene elected; patch twin folded into alternatives
    assert "ENSG002" not in rows
    assert rows["ENSG001"].alternativeGenes == ["ENSG002"]
    # no canonical chromosome: longest (ENSG003, 900bp) elected
    assert "ENSG004" not in rows
    assert rows["ENSG003"].alternativeGenes == ["ENSG004"]


def test_target_step_accretion(spark):
    hgnc = spark.createDataFrame(
        [("ENSG001", "HGNC:1", ["S1A"], ["gene one"], ["P1"])],
        "ensembl_gene_id: string, hgnc_id: string, alias_symbol: array<string>, "
        "alias_name: array<string>, uniprot_ids: array<string>",
    )
    go = spark.createDataFrame(
        [("ENSG001", "GO:1", "P"), ("ENSG001", "GO:2", "F")],
        ["ensemblId", "goId", "aspect"],
    )
    reactome = spark.createDataFrame(
        [("ENSG001", "R-1", "DNA Repair")], ["ensemblId", "pathwayId", "pathway"]
    )
    out = run_step(spark, "target", {
        "ensembl": _genes(spark), "hgnc": hgnc, "go": go, "reactome": reactome,
    })["target"]
    rows = {r.id: r for r in out.collect()}
    t = rows["ENSG001"]
    assert t.synonyms == ["S1A", "gene one"]
    assert t.dbXrefs == ["HGNC:1"]
    assert [x.goId for x in t.go] == ["GO:1", "GO:2"]
    assert t.pathways[0].pathway == "DNA Repair"
    assert t.tss == 100  # strand +1 -> start
    # protein ids: swissprot ranked before trembl, distinct accessions kept
    assert [(p.id, p.source) for p in t.proteinIds] == [
        ("P1", "uniprot_swissprot"), ("T1", "uniprot_trembl")
    ]
    # un-annotated gene still present with null annotations
    assert rows["ENSG003"].go is None


def test_target_step_with_uniprot_records(spark, tmp_path):
    from platform_etl_backend_spark.sources.flatfile import read_delimited_records

    up = tmp_path / "uniprot.txt"
    up.write_text(
        "ID   X1_HUMAN   Reviewed;  100 AA.\n"
        "AC   U100; U101;\n"
        "DE   RecName: Full=Protein X1;\n"
        "DE   AltName: Full=X one;\n"
        "GN   Name=X1;\n"
        "CC   -!- FUNCTION: Does useful things.\n"
        "CC   -!- SUBCELLULAR LOCATION: Nucleus. Cytoplasm.\n"
        "//\n"
    )
    hgnc = spark.createDataFrame(
        [("ENSG001", "HGNC:1", ["S1A"], ["gene one"], ["U100"])],
        "ensembl_gene_id: string, hgnc_id: string, alias_symbol: array<string>, "
        "alias_name: array<string>, uniprot_ids: array<string>",
    )
    out = run_step(spark, "target", {
        "ensembl": _genes(spark),
        "hgnc": hgnc,
        "uniprot": read_delimited_records(spark, str(up), "//\n"),
    })["target"]
    t = {r.id: r for r in out.collect()}["ENSG001"]
    # swissprot P1 + trembl T1 from ensembl; U100/U101 accreted as obsolete
    # accessions via hgnc mapping + entity (Target.scala:232-260)
    assert [(p.id, p.source) for p in t.proteinIds] == [
        ("P1", "uniprot_swissprot"), ("T1", "uniprot_trembl"),
        ("U100", "uniprot_obsolete"), ("U101", "uniprot_obsolete"),
    ]
    # entity annotations accreted onto the doc
    assert t.functionDescriptions == ["Does useful things."]
    assert {(loc.location, loc.source) for loc in t.subcellularLocations} == {
        ("Nucleus", "uniprot"), ("Cytoplasm", "uniprot"),
    }
    # uniprot names/symbols folded into the synonym list
    assert {"Protein X1", "X one", "X1"} <= set(t.synonyms)
