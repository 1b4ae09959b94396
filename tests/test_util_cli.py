"""Util CLI tests: img-norm calculation, config generators, weight porting."""

import csv
import os

import numpy as np
import pytest

from fixtures import write_image_folder_dataset


class TestCalcImgNorm:
    def test_uniform_gray_dataset(self, tmp_path):
        """Dataset of constant-value images -> mean == value/255, std == 0."""
        from PIL import Image
        src = tmp_path / "ds"
        for cls, val in [("a", 100), ("b", 200)]:
            os.makedirs(src / cls)
            for i in range(3):
                arr = np.full((30, 30, 3), val, np.uint8)
                Image.fromarray(arr).save(src / cls / f"{i}.png")
        from ifcb_classifier_tpu.util_cli import main_cli
        import argparse
        from ifcb_classifier_tpu.util_cli import calc_img_norm
        args = argparse.Namespace(SRC=str(src), class_config=None,
                                  class_min=1, class_max=None,
                                  resize=224, batch_size=4)
        mean, std = calc_img_norm(args)
        # one batch of a's and b's plus remainder: mean of batch means
        assert 0.3 < mean[0] < 0.75
        assert std[0] < 0.3
        assert mean.shape == (3,)

    def test_mixed_dataset_plausible(self, tmp_path):
        src = write_image_folder_dataset(str(tmp_path / "ds"),
                                         {"a": 6, "b": 6}, size=(25, 25))
        import argparse
        from ifcb_classifier_tpu.util_cli import calc_img_norm
        args = argparse.Namespace(SRC=src, class_config=None, class_min=1,
                                  class_max=None, resize=224, batch_size=8)
        mean, std = calc_img_norm(args)
        # stats are computed AFTER the square resize (as in the reference,
        # neuston_util.py:15): upscaling 25->224 interpolates, so std drops
        # well below the raw-noise 0.29. Ground-truth via PIL on the same set.
        from PIL import Image
        from ifcb_classifier_tpu.data.datasets import NeustonDataset
        nd = NeustonDataset(src, minimum_images_per_class=1)
        ref = []
        for p in nd.images:
            a = np.asarray(Image.open(p).convert("RGB").resize(
                (224, 224), Image.BILINEAR), np.float32) / 255.0
            ref.append((a.mean((0, 1)), a.std((0, 1))))
        ref_mean = np.mean([m for m, _ in ref], axis=0)
        ref_std = np.mean([s for _, s in ref], axis=0)
        np.testing.assert_allclose(mean, ref_mean, atol=0.02)
        np.testing.assert_allclose(std, ref_std, atol=0.02)


class TestConfigGenerators:
    def test_make_dataset_config(self, tmp_path):
        d1 = write_image_folder_dataset(str(tmp_path / "d1"), {"a": 1, "b": 1})
        d2 = write_image_folder_dataset(str(tmp_path / "d2"), {"b": 1, "c": 1})
        import argparse
        from ifcb_classifier_tpu.util_cli import make_dataset_config
        out = str(tmp_path / "cfg.csv")
        make_dataset_config(argparse.Namespace(
            dataset=[f"1:{d1}", d2], outfile=out))
        with open(out) as f:
            rows = list(csv.reader(f))
        assert rows[0] == ["", f"1:{d1}", f"2:{d2}"]
        assert rows[1:] == [["a", "1", "0"], ["b", "1", "1"], ["c", "0", "1"]]

    def test_make_class_config_from_dir(self, tmp_path):
        d1 = write_image_folder_dataset(str(tmp_path / "d1"), {"z": 1, "a": 1})
        import argparse
        from ifcb_classifier_tpu.util_cli import make_class_config
        out = str(tmp_path / "cc.csv")
        make_class_config(argparse.Namespace(dataset=d1, outfile=out))
        with open(out) as f:
            rows = list(csv.reader(f))
        assert rows[0] == [d1, "CONFIG1"]
        assert rows[1:] == [["a", "1"], ["z", "1"]]

    def test_make_class_config_from_csv(self, tmp_path):
        cfg = tmp_path / "ds.csv"
        cfg.write_text(",1:x,2:y\na,1,0\nb,0,0\nc,0,1\n")
        import argparse
        from ifcb_classifier_tpu.util_cli import make_class_config
        out = str(tmp_path / "cc.csv")
        make_class_config(argparse.Namespace(dataset=str(cfg), outfile=out))
        with open(out) as f:
            rows = list(csv.reader(f))
        # b dropped (all-zero row)
        assert [r[0] for r in rows[1:]] == ["a", "c"]


class TestPortWeightsCLI:
    def test_port_weights_npz(self, tmp_path):
        import torch
        sd = {"conv1.weight": torch.randn(4, 3, 3, 3),
              "bn1.weight": torch.ones(4)}
        pth = str(tmp_path / "w.pth")
        torch.save(sd, pth)
        import argparse
        from ifcb_classifier_tpu.util_cli import port_weights
        port_weights(argparse.Namespace(STATE_DICT=pth, outfile=None))
        out = np.load(str(tmp_path / "w.npz"))
        assert set(out.files) == {"conv1.weight", "bn1.weight"}
        assert out["conv1.weight"].shape == (4, 3, 3, 3)

    def test_port_weights_truncated_file_not_sniffed_as_pickle(self,
                                                               tmp_path):
        """A 1-byte file starting 0x80 must not classify as a torch pickle
        (b'' is 'in' any bytes) and die inside torch.load — it routes to
        the checkpoint loader, whose error names the real problem."""
        import argparse
        from ifcb_classifier_tpu.util_cli import port_weights
        p = str(tmp_path / "junk.bin")
        open(p, "wb").write(b"\x80")
        with pytest.raises(Exception) as ei:
            port_weights(argparse.Namespace(STATE_DICT=p, outfile=None))
        assert "torch.load" not in str(ei.value)

    def test_port_weights_reverse_to_torch(self, tmp_path):
        """Given OUR checkpoint, PORT_WEIGHTS hands back a torchvision-
        keyed .pth whose torch-zoo twin reproduces the flax logits."""
        import argparse

        import jax
        import jax.numpy as jnp
        import torch

        from ifcb_classifier_tpu.models import get_namebrand_model
        from ifcb_classifier_tpu.models.torch_zoo import build_torch_model
        from ifcb_classifier_tpu.train.checkpoint import save_checkpoint
        from ifcb_classifier_tpu.train.state import create_train_state
        from ifcb_classifier_tpu.util_cli import port_weights

        model = get_namebrand_model("resnet18", 3)
        state, _ = create_train_state(model, jax.random.PRNGKey(0), 32)
        ckpt = str(tmp_path / "m.ptl")
        save_checkpoint(ckpt, state.params, state.batch_stats,
                        dict(MODEL="resnet18", classes=["a", "b", "c"],
                             resize=32, model_id="m", seed=1,
                             img_norm=None))
        port_weights(argparse.Namespace(STATE_DICT=ckpt, outfile=None))
        pth = str(tmp_path / "m.pth")
        sd = torch.load(pth, map_location="cpu", weights_only=True)
        tm = build_torch_model("resnet18", 3)
        missing, unexpected = tm.load_state_dict(sd, strict=False)
        assert not unexpected
        assert all(k.endswith("num_batches_tracked") for k in missing)
        tm.eval()
        x = np.random.RandomState(0).rand(2, 32, 32, 3).astype(np.float32)
        with torch.no_grad():
            t = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
        f = np.asarray(model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            jnp.asarray(x), train=False))
        assert float(np.abs(t - f).max()) < 2e-4


class TestImgNormJointStd:
    def test_matches_reference_batch_std_formula(self, tmp_path):
        """STD must be the per-batch JOINT std (np.std(batch, axis=(0,2,3)),
        neuston_util.py:36) — NOT the mean of per-image stds, which omits
        inter-image mean variance (review finding). With one batch covering
        the whole dataset the two formulas differ by the inter-image term."""
        import argparse
        import glob

        from PIL import Image
        from ifcb_classifier_tpu.util_cli import calc_img_norm

        src = write_image_folder_dataset(str(tmp_path / "ds"),
                                         {"dark": 6, "light": 6},
                                         size=(24, 24), seed=7)
        for p in glob.glob(src + "/dark/*.png"):
            a = (np.asarray(Image.open(p)) * 0.2).astype(np.uint8)
            Image.fromarray(a).save(p)
        args = argparse.Namespace(SRC=src, class_config=None, class_min=1,
                                  class_max=None, resize=24, batch_size=64)
        mean, std = calc_img_norm(args)

        imgs = np.stack([
            np.asarray(Image.open(p).convert("RGB"))
            for p in sorted(glob.glob(src + "/*/*.png"))]) / 255.0
        ref_mean = imgs.mean(axis=(0, 1, 2))
        ref_std = imgs.std(axis=(0, 1, 2))          # joint (reference)
        per_img_std = imgs.std(axis=(1, 2)).mean(0)  # the WRONG formula
        np.testing.assert_allclose(mean, ref_mean, atol=0.02)
        np.testing.assert_allclose(std, ref_std, atol=0.02)
        # the two formulas genuinely differ on this dataset — the test bites
        assert abs(ref_std[0] - per_img_std[0]) > 0.05


class TestArgTypes:
    def test_batch_size_parses_to_int(self):
        """--batch-size must be type=int at the parser (a string default
        survived until deep inside CALC_IMG_NORM before round 3)."""
        from ifcb_classifier_tpu.util_cli import argparse_util
        a = argparse_util().parse_args(
            ["CALC_IMG_NORM", "somedir", "--batch-size", "16"])
        assert a.batch_size == 16 and isinstance(a.batch_size, int)
        d = argparse_util().parse_args(["CALC_IMG_NORM", "somedir"])
        assert isinstance(d.batch_size, int)
