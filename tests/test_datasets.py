"""Tests for NeustonDataset semantics (data/datasets.py) — split determinism,
class-min/max, class-config CSV, dataset-config CSV."""

import argparse
import os

import numpy as np

import pytest

from ifcb_classifier_tpu.data.datasets import (
    NeustonDataset, get_trainval_datasets, list_image_paths, parse_imgnorm,
)
from fixtures import write_image_folder_dataset


@pytest.fixture
def toy_src(tmp_path):
    return write_image_folder_dataset(
        str(tmp_path / "ds"), {"alpha": 10, "beta": 6, "gamma": 1})


class TestNeustonDataset:
    def test_scan_and_class_min(self, toy_src):
        nd = NeustonDataset(toy_src, minimum_images_per_class=2)
        assert nd.classes == ["alpha", "beta"]  # gamma dropped (1 < 2)
        assert nd.classes_ignored_from_too_few_samples == [("gamma", 1)]
        assert len(nd) == 16
        assert nd.count_perclass == [10, 6]

    def test_class_max(self, toy_src):
        import random
        random.seed(1)
        nd = NeustonDataset(toy_src, minimum_images_per_class=2,
                            maximum_images_per_class=4)
        assert nd.count_perclass == [4, 4]
        assert nd.classes_limited_from_too_many_samples == ["alpha", "beta"]

    def test_targets_parallel_to_images(self, toy_src):
        nd = NeustonDataset(toy_src, minimum_images_per_class=2)
        for img, t in zip(nd.images, nd.targets):
            assert os.sep + nd.classes[t] + os.sep in img

    def test_split_deterministic(self, toy_src):
        nd = NeustonDataset(toy_src, minimum_images_per_class=2)
        t1, v1 = nd.split(80, 20, seed=42)
        t2, v2 = nd.split(80, 20, seed=42)
        assert t1.images == t2.images and v1.images == v2.images
        assert len(t1) + len(v1) == len(nd)
        assert set(t1.images).isdisjoint(v1.images)
        # 80% of 10 = 8, 80% of 6 = round(4.8+0.5) = 5
        assert t1.count_perclass == [8, 5]
        assert v1.count_perclass == [2, 1]

    def test_split_guarantees_val_image(self, tmp_path):
        src = write_image_folder_dataset(str(tmp_path / "d2"), {"only": 2})
        nd = NeustonDataset(src, minimum_images_per_class=2)
        t, v = nd.split(80, 20, seed=7)
        # int(0.8*2+0.5)=2 == len -> one image moved to val (neuston_data.py:164-166)
        assert len(t) == 1 and len(v) == 1

    def test_split_bad_ratio(self, toy_src):
        nd = NeustonDataset(toy_src)
        with pytest.raises(AssertionError):
            nd.split(80, 30)

    def test_from_csv_keep_drop_merge(self, toy_src, tmp_path):
        cfg = tmp_path / "cfg.csv"
        cfg.write_text("class,run1\nalpha,1\nbeta,grouped\ngamma,grouped\nmissing,1\n")
        nd = NeustonDataset.from_csv(toy_src, str(cfg), "run1",
                                     minimum_images_per_class=1)
        assert nd.classes == ["alpha", "grouped"]
        assert nd.count_perclass == [10, 7]

    def test_from_csv_drop(self, toy_src, tmp_path):
        cfg = tmp_path / "cfg.csv"
        cfg.write_text("class,run1\nalpha,1\nbeta,0\ngamma,0\n")
        nd = NeustonDataset.from_csv(toy_src, str(cfg), "run1")
        assert nd.classes == ["alpha"]

    def test_from_csv_nothing_left_raises(self, toy_src, tmp_path):
        """A config that drops or mismatches EVERY class must fail loudly:
        the reference would pass {} to the constructor, which treats it as
        'no config given' and silently rescans src — training on all
        classes with the config ignored (QUIRKS.md, FIXED)."""
        cfg = tmp_path / "cfg.csv"
        cfg.write_text("class,run1\nalpha,0\nbeta,0\ngamma,0\nnosuch,1\n")
        with pytest.raises(ValueError, match="leaves no classes"):
            NeustonDataset.from_csv(toy_src, str(cfg), "run1")

    def test_dataset_config_csv(self, tmp_path):
        src1 = write_image_folder_dataset(str(tmp_path / "d1"), {"a": 3, "b": 2})
        src2 = write_image_folder_dataset(str(tmp_path / "d2"), {"a": 2, "c": 4})
        cfg = tmp_path / "datasets.csv"
        cfg.write_text(
            "class,1:{},2:{}\na,1,1\nb,1,0\nc,0,1\n".format(src1, src2))
        ipc = NeustonDataset.fetch_images_perclass(str(cfg))
        assert sorted(ipc) == ["a", "b", "c"]
        assert len(ipc["a"]) == 5  # merged across datasets
        # priority 1 dataset images come first for class a
        assert all(str(tmp_path / "d1") in p for p in ipc["a"][:3])


class TestTrainvalDatasets:
    def test_get_trainval(self, toy_src):
        args = argparse.Namespace(SRC=toy_src, class_config=None, class_min=2,
                                  class_max=None, split="80:20", seed=5, swap=False)
        tr, va = get_trainval_datasets(args)
        assert tr.classes == va.classes == ["alpha", "beta"]
        assert len(tr) == 13 and len(va) == 3

    def test_swap(self, toy_src):
        args = argparse.Namespace(SRC=toy_src, class_config=None, class_min=2,
                                  class_max=None, split="80:20", seed=5, swap=True)
        tr, va = get_trainval_datasets(args)
        assert len(tr) == 3 and len(va) == 13


class TestHelpers:
    def test_parse_imgnorm_broadcast(self):
        mean, std = parse_imgnorm(["0.5", "0.25"])
        assert mean == [0.5] * 3 and std == [0.25] * 3

    def test_parse_imgnorm_triplet(self):
        mean, std = parse_imgnorm(["0.1,0.2,0.3", "0.4,0.5,0.6"])
        assert mean == [0.1, 0.2, 0.3] and std == [0.4, 0.5, 0.6]

    def test_list_image_paths_dir_and_filter(self, toy_src):
        paths = list_image_paths(toy_src)
        assert len(paths) == 17
        only_beta = list_image_paths(toy_src, "IN", ["beta"])
        assert len(only_beta) == 6
        no_beta = list_image_paths(toy_src, "OUT", ["beta"])
        assert len(no_beta) == 11

    def test_list_image_paths_txt(self, toy_src, tmp_path):
        paths = list_image_paths(toy_src)[:3]
        lst = tmp_path / "imgs.txt"
        lst.write_text("\n".join(paths) + "\nnot_an_image.xyz\n")
        assert list_image_paths(str(lst)) == paths


class TestImageCache:
    """--cache-images: decoded arrays are reused after epoch 1 (the
    reference re-decodes every image every epoch, neuston_data.py:257-263)."""

    def test_decodes_once_across_epochs(self, tmp_path, monkeypatch):
        from fixtures import write_image_folder_dataset
        from ifcb_classifier_tpu.data import pipeline
        src = write_image_folder_dataset(str(tmp_path / "ds"), {"a": 7},
                                         size=(24, 20))
        paths = sorted(str(p) for p in (tmp_path / "ds" / "a").iterdir())
        calls = {"n": 0}
        real = pipeline.decode_image
        def counting(path, rgb):
            calls["n"] += 1
            return real(path, rgb=rgb)
        monkeypatch.setattr(pipeline, "decode_image", counting)

        cached = pipeline.HostLoader(paths, [0] * 7, batch_size=4, cache=True)
        out1 = [b["canvas"].copy() for b in cached]
        n_first = calls["n"]
        out2 = [b["canvas"].copy() for b in cached]
        assert n_first == 7
        assert calls["n"] == n_first  # epoch 2: zero decodes
        for a, b in zip(out1, out2):
            np.testing.assert_array_equal(a, b)

        calls["n"] = 0
        uncached = pipeline.HostLoader(paths, [0] * 7, batch_size=4)
        list(uncached); list(uncached)
        assert calls["n"] == 14  # re-decoded every epoch without the flag

    def test_cli_flag(self):
        from ifcb_classifier_tpu.cli import argparse_nn
        a = argparse_nn().parse_args(["TRAIN", "s", "resnet18", "i",
                                      "--cache-images"])
        assert a.cache_images is True
