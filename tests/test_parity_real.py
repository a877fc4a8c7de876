"""Mount-activated accuracy parity vs the reference's published numbers
(VERDICT round-1 item 7).

The real Camelyon16 / TCGA-lung feature sets and the classic MIL datasets
are not downloadable in this zero-egress container, so these tests activate
when the data is mounted at the same ``datasets/`` layout the reference's
``download.py`` produces (mirrored by ``tpumil.cli.download``):

    datasets/Camelyon16/Camelyon16.csv       (download --dataset=c16)
    datasets/tcga-dataset/TCGA.csv           (download --dataset=tcga)
    datasets/mil_dataset/Musk/musk1norm.svm  (download --dataset=mil)

Targets are the reference README tables (README.md:77-95, BASELINE.md) with
the reference's own stated ±2% random-split tolerance (README.md:76).
Run with ``pytest -k parity_real`` after mounting the data; everything
skips cleanly when absent.

The vendored-fixture test at the bottom always runs: it drives the same
file-loading + run_mil_cv accuracy path on a committed musk1-format svm
file, so the real-data path is one dataset mount away from proven.
"""

import os

import numpy as np
import pytest

DATA = os.environ.get("TPUMIL_DATASETS", "datasets")


def _skip_unless(path):
    full = os.path.join(DATA, path)
    if not os.path.exists(full):
        pytest.skip(f"real dataset not mounted: {full}")
    return full


def _load_wsi_bags(master_csv, num_classes, dataset, tmp_path):
    from tpumil.data.feature_store import BagCache, read_master_csv

    cache = BagCache(str(tmp_path / "cache"))
    cache.build(read_master_csv(master_csv), num_classes, dataset=dataset,
                seed=0)
    return cache.load_all()


@pytest.mark.parity_real
def test_parity_real_c16_5fold(tmp_path):
    """Camelyon16 5-fold CV: acc 94.9% / AUC 0.961 (README.md:77-81) ±2%."""
    csv = _skip_unless("Camelyon16/Camelyon16.csv")
    from tpumil.train.schemes import WSITrainConfig, run_5fold_cv

    bags = _load_wsi_bags(csv, 1, "Camelyon16", tmp_path)
    cfg = WSITrainConfig(num_classes=1, feats_size=512, lr=1e-4,
                         num_epochs=50, stop_epochs=10, seed=0, verbose=False)
    res = run_5fold_cv(bags, cfg, log=lambda s: None)
    assert abs(res["mean_auc"][0] - 0.961) <= 0.02, res
    assert abs(res["mean_accuracy"] - 0.949) <= 0.02, res


@pytest.mark.parity_real
def test_parity_real_c16_standalone(tmp_path):
    """Camelyon16 5-fold CV + standalone test: acc 92.4% / AUC 0.915
    (README.md:82-85) ±2%."""
    csv = _skip_unless("Camelyon16/Camelyon16.csv")
    from tpumil.train.schemes import WSITrainConfig, run_5fold_cv_standalone_test

    bags = _load_wsi_bags(csv, 1, "Camelyon16", tmp_path)
    cfg = WSITrainConfig(num_classes=1, feats_size=512, lr=1e-4,
                         num_epochs=50, stop_epochs=10, split=0.2, seed=0,
                         verbose=False)
    res = run_5fold_cv_standalone_test(bags, cfg, log=lambda s: None,
                                       save_dir=str(tmp_path / "test"))
    fold_auc = float(np.mean([f["aucs"][0] for f in res["folds"]]))
    assert abs(fold_auc - 0.915) <= 0.02, res
    assert abs(res["final"]["accuracy"] - 0.924) <= 0.02, res


@pytest.mark.parity_real
def test_parity_real_tcga_5fold(tmp_path):
    """TCGA-lung 5-fold CV: acc 93.78% / AUC 0.981 (README.md:87-90) ±2%."""
    csv = _skip_unless("tcga-dataset/TCGA.csv")
    from tpumil.train.schemes import WSITrainConfig, run_5fold_cv

    bags = _load_wsi_bags(csv, 2, "TCGA-lung-default", tmp_path)
    cfg = WSITrainConfig(num_classes=2, feats_size=512, lr=1e-4,
                         num_epochs=50, stop_epochs=10, seed=0, verbose=False)
    res = run_5fold_cv(bags, cfg, log=lambda s: None)
    assert abs(float(np.mean(res["mean_auc"])) - 0.981) <= 0.02, res
    assert abs(res["mean_accuracy"] - 0.9378) <= 0.02, res


@pytest.mark.parity_real
def test_parity_real_musk1():
    """Musk1 10-fold CV (train_mil.py defaults). The DSMIL paper reports
    ~93.2% mean accuracy; the README grants ±2 (we allow ±3 for the tiny
    47/45-bag dataset's split variance)."""
    svm = _skip_unless("mil_dataset/Musk/musk1norm.svm")
    from tpumil.data.mil_bench import parse_mil_file
    from tpumil.train.schemes import MILBenchConfig, run_mil_cv

    bags = parse_mil_file(svm, num_feats=166)
    assert len(bags) == 92  # 47 positive + 45 negative molecule bags
    cfg = MILBenchConfig(num_feats=166, verbose=False)
    mean_acc, std_acc, _ = run_mil_cv(bags, cfg, log=lambda s: None)
    assert abs(mean_acc - 0.932) <= 0.03, (mean_acc, std_acc)


def test_mil_cv_on_vendored_musk1_format_fixture():
    """Always-on stand-in for the real musk1 run: the committed
    tests/data/musk1_mini.svm is in the exact musk1norm.svm format
    (``inst:bag:+/-1`` ids, 1-indexed feature:value pairs, first line
    consumed as header) and run_mil_cv must reach high accuracy on it
    through the same parse -> pos_weight -> CV path."""
    from tpumil.data.mil_bench import compute_pos_weight, parse_mil_file
    from tpumil.train.schemes import MILBenchConfig, run_mil_cv

    path = os.path.join(os.path.dirname(__file__), "data", "musk1_mini.svm")
    bags = parse_mil_file(path, num_feats=166)
    assert len(bags) == 30
    assert all(b.feats.shape[1] == 166 for b in bags)
    # -1 labels clip to 0 exactly as the reference's label handling
    labels = sorted({float(b.label[0]) for b in bags})
    assert labels == [0.0, 1.0]
    assert 0.3 < compute_pos_weight(bags) < 3.0
    cfg = MILBenchConfig(num_feats=166, num_epochs=40, cv_fold=10, seed=0,
                         verbose=False)  # train_mil.py defaults
    mean_acc, std_acc, fold_accs = run_mil_cv(bags, cfg, log=lambda s: None)
    assert mean_acc >= 0.9, (mean_acc, fold_accs)


def test_init_deviation_bounded_on_vendored_fixture():
    """VERDICT r2 #10: run_mil_cv defaults to orthogonal init where the
    reference's train_mil.py trains with torch Linear/Conv1d defaults.
    Bound the deviation: both init paths through the identical parse ->
    pos_weight -> 10-fold CV pipeline on the vendored fixture must land in
    the same accuracy band (the reference's own tolerance is +-2%,
    README.md:76; the fixture is tiny so we grant +-5%)."""
    import dataclasses as dc

    from tpumil.data.mil_bench import parse_mil_file
    from tpumil.train.schemes import MILBenchConfig, run_mil_cv

    path = os.path.join(os.path.dirname(__file__), "data", "musk1_mini.svm")
    bags = parse_mil_file(path, num_feats=166)
    cfg = MILBenchConfig(num_feats=166, num_epochs=40, cv_fold=10, seed=0,
                         verbose=False)
    mean_orth, _, _ = run_mil_cv(bags, cfg, log=lambda s: None)
    mean_torch, _, _ = run_mil_cv(bags, dc.replace(cfg, init="torch_default"),
                                  log=lambda s: None)
    assert mean_orth >= 0.9 and mean_torch >= 0.9, (mean_orth, mean_torch)
    assert abs(mean_orth - mean_torch) <= 0.05, (mean_orth, mean_torch)


# ---------------------------------------------------------------------------
# Demo-flow parity (VERDICT r2 #6): when the reference's demo downloads are
# mounted (download.py --dataset=c16-test / tcga-test layout, optionally
# rooted at $TPUMIL_DEMO), run the shipped embedder+aggregator through the
# testing CLIs and pin verdicts + bag scores against a torch oracle built
# from /root/reference's own dsmil modules on CPU.
# ---------------------------------------------------------------------------

DEMO = os.environ.get("TPUMIL_DEMO", ".")


def _demo_skip(*paths):
    out = []
    for p in paths:
        full = os.path.join(DEMO, p)
        if not os.path.exists(full):
            pytest.skip(f"demo download not mounted: {full}")
        out.append(full)
    return out


def _reference_torch_bag_scores(bag_dirs, embedder_pth, aggregator_pth,
                                num_classes):
    """Bag sigmoid scores via the REFERENCE's own torch modules on CPU
    (testing_c16.py:104-141 / testing_tcga.py:56-87 semantics: popitem x 4
    positional embedder surgery, fc from the aggregator, full-bag
    b_classifier)."""
    import collections
    import glob as _glob
    import sys

    torch = pytest.importorskip("torch")
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import dsmil as mil  # the reference's module
    from torch_resnet_oracle import TorchResNet

    resnet = TorchResNet(18, torch.nn.InstanceNorm2d)
    for p in resnet.parameters():
        p.requires_grad = False
    i_clf = mil.IClassifier(resnet, 512, output_class=num_classes)
    b_clf = mil.BClassifier(input_size=512, output_class=num_classes)
    net = mil.MILNet(i_clf, b_clf)
    agg = torch.load(aggregator_pth, map_location="cpu")
    net.load_state_dict(agg, strict=False)
    sd = torch.load(embedder_pth, map_location="cpu")
    for _ in range(4):
        sd.popitem()
    new = collections.OrderedDict()
    for (k, v), (k0, v0) in zip(sd.items(), i_clf.state_dict().items()):
        new[k0] = v
    new["fc.weight"] = agg["i_classifier.fc.0.weight"]
    new["fc.bias"] = agg["i_classifier.fc.0.bias"]
    i_clf.load_state_dict(new, strict=True)
    net.i_classifier = i_clf
    net.eval()

    from PIL import Image

    scores = {}
    with torch.no_grad():
        for bag in bag_dirs:
            jpgs = _glob.glob(os.path.join(bag, "*.jpg"))
            feats_list, cls_list = [], []
            for lo in range(0, len(jpgs), 64):
                imgs = np.stack([
                    np.asarray(Image.open(p).convert("RGB"), np.float32)
                    / 255.0 for p in jpgs[lo:lo + 64]])
                x = torch.from_numpy(np.transpose(imgs, (0, 3, 1, 2)).copy())
                f, c = net.i_classifier(x)
                feats_list.append(f.numpy())
                cls_list.append(c.numpy())
            bag_pred, _, _ = net.b_classifier(
                torch.from_numpy(np.vstack(feats_list)),
                torch.from_numpy(np.vstack(cls_list)))
            scores[bag] = torch.sigmoid(bag_pred).squeeze(0).numpy()
    return scores


@pytest.mark.parity_real
def test_parity_real_c16_demo_flow(tmp_path, capsys):
    """testing_c16 over the mounted demo download: verdicts at the exact
    reference threshold 0.5282700061798096 (testing_c16.py:110) must match
    the reference-module torch oracle, and the heatmap PNGs must render."""
    patches, emb, agg = _demo_skip(
        os.path.join("test-c16", "patches"),
        os.path.join("test-c16", "weights", "embedder.pth"),
        os.path.join("example_aggregator_weights", "c16_aggregator.pth"))
    import glob as _glob

    from tpumil.cli import testing_c16

    out = str(tmp_path / "out")
    rc = testing_c16.main(["--bag_path", patches, "--embedder_weights", emb,
                           "--aggregator_weights", agg, "--output", out,
                           "--device", "cpu"])
    assert rc == 0
    lines = [ln for ln in capsys.readouterr().out.splitlines()
             if " is detected as " in ln]
    bag_dirs = sorted(_glob.glob(os.path.join(patches, "*")))
    assert len(lines) == len(bag_dirs) > 0
    got = {ln.rsplit(" is detected as ", 1)[0]:
           ln.rsplit(" is detected as ", 1)[1] for ln in lines}

    oracle = _reference_torch_bag_scores(bag_dirs, emb, agg, num_classes=1)
    thres = 0.5282700061798096
    for bag in bag_dirs:
        score = float(np.squeeze(oracle[bag]))
        want = "malignant" if score >= thres else "benign"
        assert got[bag] == want, (bag, got[bag], score)
        png = os.path.join(out, os.path.basename(bag) + ".png")
        assert os.path.exists(png) and os.path.getsize(png) > 0


@pytest.mark.parity_real
def test_parity_real_tcga_demo_flow(tmp_path, capsys):
    """testing_tcga over the mounted demo download: the 4-way verdict at
    the reference thresholds 0.45798/0.58273 (testing_tcga.py:117-118) must
    match the reference-module torch oracle."""
    patches, emb, agg = _demo_skip(
        os.path.join("test", "patches"),
        os.path.join("test", "weights", "embedder.pth"),
        os.path.join("example_aggregator_weights", "tcga_aggregator.pth"))
    import glob as _glob

    from tpumil.cli import testing_tcga

    out = str(tmp_path / "out")
    rc = testing_tcga.main(["--bag_path", patches, "--embedder_weights", emb,
                            "--aggregator_weights", agg, "--output", out,
                            "--device", "cpu"])
    assert rc == 0
    lines = [ln for ln in capsys.readouterr().out.splitlines()
             if " is detected as: " in ln]
    bag_dirs = sorted(_glob.glob(os.path.join(patches, "*")))
    assert len(lines) == len(bag_dirs) > 0
    got = {ln.split(" is detected as: ")[0]:
           ln.split(" is detected as: ")[1] for ln in lines}

    oracle = _reference_torch_bag_scores(bag_dirs, emb, agg, num_classes=2)
    t_luad, t_lusc = 0.45798203349113464, 0.5827295184135437
    for bag in bag_dirs:
        s = oracle[bag]
        if s[0] >= t_luad and s[1] < t_lusc:
            want = "LUAD"
        elif s[1] >= t_lusc and s[0] < t_luad:
            want = "LUSC"
        elif s[0] < t_luad and s[1] < t_lusc:
            want = "benign"
        else:
            want = "both LUAD and LUSC"
        assert got[bag] == want, (bag, got[bag], s.tolist())
