"""Docs tooling: the API-reference generator and the tutorial notebook."""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))


def test_api_docs_generate(tmp_path):
    import gen_api_docs

    pages = gen_api_docs.generate(str(tmp_path))
    assert "index.md" in pages
    spatial = pages["tangram_tpu_spatial.md"]
    assert "spatial_neighbors" in spatial and "coord_type" in spatial
    mapper = pages["tangram_tpu_models_mapper.md"]
    assert "fit_mapping" in mapper and "class `Mapper" in mapper
    # every documented module links from the index
    for mod in gen_api_docs.MODULES:
        assert mod.replace(".", "_") + ".md" in pages
        assert f"`{mod}`" in pages["index.md"]


def test_api_docs_committed_and_current():
    """docs/reference is committed and regenerating it is a no-op (the
    generator's --check mode)."""
    import gen_api_docs

    ref_dir = os.path.join(REPO, "docs", "reference")
    assert os.path.isdir(ref_dir), "run scripts/gen_api_docs.py"
    rc = gen_api_docs.main(["--check", "--outdir", ref_dir])
    assert rc == 0, "docs/reference stale: rerun scripts/gen_api_docs.py"


def test_tutorial_notebook_valid():
    path = os.path.join(REPO, "notebooks", "tutorial_tangram_tpu.ipynb")
    assert os.path.exists(path), "run scripts/gen_tutorial_notebook.py"
    nb = json.load(open(path))
    assert nb["nbformat"] == 4
    kinds = {c["cell_type"] for c in nb["cells"]}
    assert kinds == {"markdown", "code"}
    for c in nb["cells"]:
        if c["cell_type"] == "code":
            assert c["outputs"] == [] and c["execution_count"] is None
            compile("".join(c["source"]), "<cell>", "exec")  # syntax-valid
    joined = "".join(
        "".join(c["source"]) for c in nb["cells"] if c["cell_type"] == "code"
    )
    for call in ("pp_adatas", "map_cells_to_space", "project_genes",
                 "cross_val", "eval_metric"):
        assert call in joined
