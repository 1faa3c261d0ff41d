"""One-command real-data campaign entry (VERDICT r4 next #6).

Proves the reference manifest format end-to-end with tiny stand-in
meshes: a dataset dir laid out exactly like the reference's
dataset/<type>/{train,test}/{noisy,original} + train_list.txt /
test_list.txt manifests (reference discovery code/dataset.py:83-103,
manifests dataset/Synthetic/train_list.txt) drives train -> test-split
inference -> corpus eval through `python -m geobignn_tpu campaign`.
The day the CNR/Kinect corpora are dropped in, the full accuracy parity
run is this command on the real dir.
"""

import glob
import json
import os

import numpy as np
import pytest

from geobignn_tpu import cli, meshio
from geobignn_tpu.data import synth
from geobignn_tpu.data.dataset import discover_mesh_pairs

pytestmark = pytest.mark.slow

# shape names drawn from the reference Synthetic manifest vocabulary —
# the list files select by bare name, one per line
TRAIN_NAMES = ["Cylinder", "Icosahedron"]
TEST_NAMES = ["Octahedron"]


def _make_corpus(root):
    """Reference-layout corpus with tiny icospheres standing in for the
    real CNR meshes; two noise draws per shape like `{name}_n*.obj`."""
    for split, names in (("train", TRAIN_NAMES), ("test", TEST_NAMES)):
        nd = os.path.join(root, "Synthetic", split, "noisy")
        od = os.path.join(root, "Synthetic", split, "original")
        os.makedirs(nd), os.makedirs(od)
        for i, name in enumerate(names):
            m_o = synth.icosphere(2)
            meshio.write_obj(
                os.path.join(od, f"{name}.obj"), m_o.points, m_o.fv_indices)
            for k in (1, 2):
                m_n = synth.add_noise(m_o, 0.15, seed=10 * i + k)
                meshio.write_obj(
                    os.path.join(nd, f"{name}_n{k}.obj"),
                    m_n.points, m_n.fv_indices)
        with open(os.path.join(root, "Synthetic", f"{split}_list.txt"),
                  "w") as f:
            f.write("\n".join(names) + "\n")


def test_manifest_discovery_matches_reference_format(tmp_path):
    root = str(tmp_path / "dataset")
    _make_corpus(root)
    pairs = discover_mesh_pairs(root, "Synthetic", "train", "train_list.txt")
    assert len(pairs) == 4  # 2 shapes x 2 noise draws
    for noisy, orig in pairs:
        assert os.path.exists(noisy) and os.path.exists(orig)
        base = os.path.basename(orig)[:-4]
        assert os.path.basename(noisy).startswith(base + "_n")
    # a manifest that names a subset must NOT leak the other shapes
    with open(os.path.join(root, "Synthetic", "train_list.txt"), "w") as f:
        f.write(TRAIN_NAMES[0] + "\n")
    assert len(discover_mesh_pairs(
        root, "Synthetic", "train", "train_list.txt")) == 2
    # and a requested-but-missing manifest fails loudly, never globs
    with pytest.raises(FileNotFoundError):
        discover_mesh_pairs(root, "Synthetic", "train", "nope_list.txt")


def test_campaign_entry_end_to_end(tmp_path, monkeypatch):
    root = str(tmp_path / "dataset")
    _make_corpus(root)
    monkeypatch.chdir(tmp_path)  # run dirs land under tmp log/
    summary = cli.main([
        "campaign", "--data_type=Synthetic", "--flag=smoke",
        f"--dataset_dir={root}",
        "--max_epoch=2", "--seed=1", "--augment=false",
        "--granularity=16", "--sub_size=100000",
    ])
    assert summary and np.isfinite(summary["angle_mean1"])
    assert np.isfinite(summary["angle_mean2"])
    # result meshes for every manifest-selected test pair
    res = sorted(glob.glob(os.path.join(
        root, "Synthetic", "test", "result_smoke", "*.obj")))
    assert len(res) == 2  # Octahedron_n1 / _n2
    # corpus eval (ErrorInfo table) ran and the summary was persisted
    assert summary["corpus"] is not None
    with open(os.path.join(summary["run_dir"], "campaign_summary.json")) as f:
        js = json.load(f)
    assert js["angle_mean1"] == summary["angle_mean1"]
    assert os.path.exists(os.path.join(
        root, "Synthetic", "test", "result_smoke", "ErrorInfo_h.txt"))
