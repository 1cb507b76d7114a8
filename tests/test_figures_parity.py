"""Figure-parity manifest: demo_zoo/FIGURES_PARITY.json maps every reference
paper_figures output to its zoo artifact (data/models behind it, rendered-at
commit) so "is the zoo done?" is a single machine-checked file, not
archaeology.  Parity: the reference has no such manifest; the script list is
/root/reference/paper_figures/ (12 experiment scripts + composer/common).
"""
import json
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
MANIFEST = REPO / "demo_zoo" / "FIGURES_PARITY.json"

# every reference paper_figures experiment script must appear in the manifest
REFERENCE_SCRIPTS = {
    "diffusion mdoel compare_experiment.py",
    "graph_generalization_experiment.py",
    "dynamics_transfer_experiment.py",
    "model_sensitivity_experiment.py",
    "tipping_types_experiment.py",
    "SLBP_model_analysis_experiment.py",
    "model_train_analysis.py",
    "train_source_comparison_experiment.py",
    "smoothing_experiment.py",
    "real_systems_experiment.py",
    "plot_bury_real_transition_points.py",
    "mpv_collapse_summary.py",
}


def _load():
    return json.loads(MANIFEST.read_text())


def test_manifest_exists_and_well_formed():
    m = _load()
    assert m["entries"], "manifest has no entries"
    for e in m["entries"]:
        assert e["status"] in ("committed", "pending"), e
        assert e["artifacts"], e
        assert e["reference_script"], e


def test_every_reference_script_is_mapped():
    covered = set()
    for e in _load()["entries"]:
        ref = e["reference_script"].split("/")[-1]
        # strip qualifiers like "(per-dataset)"
        covered.add(ref.split(" (")[0])
    missing = REFERENCE_SCRIPTS - covered
    assert not missing, f"reference figure scripts with no manifest entry: {missing}"


def test_committed_artifacts_exist():
    gone = [
        a
        for e in _load()["entries"]
        if e["status"] == "committed"
        for a in e["artifacts"]
        if not (REPO / a).exists()
    ]
    assert not gone, f"manifest lists committed artifacts that are missing: {gone}"


def test_committed_artifacts_are_nonempty():
    empty = [
        a
        for e in _load()["entries"]
        if e["status"] == "committed"
        for a in e["artifacts"]
        if (REPO / a).exists() and (REPO / a).stat().st_size == 0
    ]
    assert not empty, f"zero-byte artifacts: {empty}"
