"""Packaging metadata stays consistent with the code.

The reference is a bare research checkout (`python run_predict.py ...`,
SURVEY §1); this framework is additionally pip-installable (pyproject.toml)
with console entry points. A full `pip install` is not exercised here (no
network / no writes outside the checkout) — these tests pin the parts that
rot: entry-point targets resolve to callables, the root shims keep the
reference invocation working, and every package directory is discoverable.
"""

import os
import sys
import tomllib

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


@pytest.fixture(scope="module")
def project():
    with open(os.path.join(REPO, "pyproject.toml"), "rb") as f:
        return tomllib.load(f)["project"]


def _resolve(entry):
    module, _, attr = entry.partition(":")
    __import__(module)
    return getattr(sys.modules[module], attr)


def test_console_scripts_resolve(project):
    scripts = project["scripts"]
    assert set(scripts) == {"hp3d-predict", "hp3d-train", "hp3d-evaluate"}
    for entry in scripts.values():
        assert callable(_resolve(entry))


def test_console_scripts_build_reference_flags(project):
    """Each entry point's parser still exposes the reference CLI surface
    (spot-check the flags SURVEY §2.1 lists per entry point)."""
    expected = {
        "hp3d-predict": ["--image_dir", "--save_dir", "--pose_shape_weights",
                         "--cropped_images", "--visualise_samples",
                         "--joints2Dvisib_threshold", "--gender"],
        "hp3d-train": ["--experiment_dir", "--pose_shape_cfg_opts",
                       "--resume_from_epoch"],
        "hp3d-evaluate": ["--dataset", "--pose_shape_weights",
                          "--num_samples", "--batch_size"],
    }
    for script, flags in expected.items():
        module = project["scripts"][script].partition(":")[0]
        __import__(module)
        parser = sys.modules[module].build_parser()
        known = {opt for a in parser._actions for opt in a.option_strings}
        missing = [f for f in flags if f not in known]
        assert not missing, (script, missing)


def _import_root_module(name):
    """Load a repo-root shim by explicit file path: other test modules put
    /root/reference at sys.path[0], where `import run_predict` would resolve
    to the REFERENCE's script instead of this repo's shim."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        f"_shim_{name}", os.path.join(REPO, name + ".py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_root_shims_reexport_cli():
    run_predict = _import_root_module("run_predict")
    run_train = _import_root_module("run_train")
    run_evaluate = _import_root_module("run_evaluate")
    from hierarchicalprobabilistic3dhuman_tpu.cli import evaluate, predict, train
    assert run_predict.main is predict.main
    assert run_predict.run_predict is predict.run_predict
    assert run_train.main is train.main
    assert run_train.run_train is train.run_train
    assert run_evaluate.main is evaluate.main
    assert run_evaluate.run_evaluate is evaluate.run_evaluate


def test_all_package_dirs_are_packages():
    """setuptools' find_packages only ships directories with __init__.py —
    a new source directory without one would be silently dropped from
    wheels (native/ was exactly this case)."""
    from setuptools import find_packages
    found = set(find_packages(where=REPO,
                              include=["hierarchicalprobabilistic3dhuman_tpu*"]))
    pkg_root = os.path.join(REPO, "hierarchicalprobabilistic3dhuman_tpu")
    for root, dirs, files in os.walk(pkg_root):
        dirs[:] = [d for d in dirs if d != "__pycache__"]
        if any(f.endswith((".py", ".cpp")) for f in files):
            rel = os.path.relpath(root, REPO).replace(os.sep, ".")
            assert rel in found, f"{rel} missing __init__.py (not packaged)"


def test_native_source_ships_as_package_data():
    with open(os.path.join(REPO, "pyproject.toml"), "rb") as f:
        tool = tomllib.load(f)["tool"]["setuptools"]
    patterns = tool["package-data"]["hierarchicalprobabilistic3dhuman_tpu.native"]
    assert "*.cpp" in patterns
    assert os.path.exists(os.path.join(
        REPO, "hierarchicalprobabilistic3dhuman_tpu", "native",
        "batch_sampler.cpp"))
