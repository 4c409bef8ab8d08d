"""Docs drift checks: the per-step algorithm pages must track the real
config schema (VERDICT r1 item #10 — per-step pages, drift-checked in CI).
"""

import re
from pathlib import Path

DOCS = Path(__file__).resolve().parent.parent / "docs" / "algorithms"


def _schema_paths():
    from grid_tpu.config import STEP_SCHEMA, WES_SCHEMA

    paths = set()
    for schema in (STEP_SCHEMA, WES_SCHEMA):
        for ent in schema:
            paths.add(".".join(ent["path"]))
    return paths


def test_all_step_pages_exist():
    expected = [
        "step1_index.md", "step2_count_reads.md", "step3_coverage.md",
        "step4_normalize.md", "step5_neighbors.md", "step6_dipcn.md",
        "step7_hi_inference.md", "kiv2_exon_path.md",
    ]
    for name in expected:
        page = DOCS / name
        assert page.exists(), f"missing algorithm page {name}"
        assert len(page.read_text()) > 500, f"{name} is a stub"


def test_config_keys_in_docs_exist_in_schema():
    """Every dotted `section.key` (and `.key` continuation) named in a
    'Config keys' paragraph must resolve in the schema."""
    schema = _schema_paths()
    sections = {p.split(".")[0] for p in schema}
    problems = []
    for page in sorted(DOCS.glob("*.md")):
        text = page.read_text()
        m = re.search(r"## Config keys\n+(.+?)(\n#|\Z)", text, re.S)
        if not m:
            continue
        block = m.group(1)
        current_prefix = None
        for tok in re.findall(r"`([A-Za-z0-9_.]+)`", block):
            if tok.startswith("."):
                if current_prefix is None:
                    continue
                path = current_prefix + tok
            elif "." in tok:
                path = tok
                current_prefix = ".".join(tok.split(".")[:-1])
            else:
                # bare token: a global key (samples_file etc.) — accept a
                # known-global list
                if tok not in {"samples_file", "directory_loc", "file_type",
                               "output_dir", "output_file_type", "threads",
                               "min_mapq", "chrom", "start_bp", "end_bp",
                               "reference_genome"}:
                    problems.append(f"{page.name}: unknown global `{tok}`")
                continue
            if path.endswith(".run"):
                # run: gates are implicit in the schema (per-section "gate"
                # fields); accept when the section itself has schema entries
                gate_prefix = path[: -len(".run")]
                if any(s.startswith(gate_prefix + ".") or s == gate_prefix
                       for s in schema):
                    continue
            if path.split(".")[0] in sections and path not in schema:
                problems.append(f"{page.name}: `{path}` not in config schema")
    assert not problems, "\n".join(problems)


def test_quirk_contract_cross_links():
    """The pages must keep citing the parity quirks they implement."""
    joined = " ".join(p.read_text() for p in DOCS.glob("*.md"))
    for quirk in ("Q2", "Q3", "Q4", "Q5", "1e-9", "N - 1", "Gauss-Seidel"):
        assert quirk in joined, f"quirk {quirk} no longer documented"
