"""Golden-detail tests for the .json/.mat/.h5 result writers — the dtype/
+1-indexing/gzip/attrs specifics that MATLAB-side consumers depend on."""

import json
import os

import numpy as np
import pytest

from ifcb_classifier_tpu.data.ifcb import Pid
from ifcb_classifier_tpu.results.run import save_run_results
from ifcb_classifier_tpu.results.validation import (
    DEFAULT_SERIES, compute_validation_results, save_validation_results,
)


@pytest.fixture
def val_results():
    rng = np.random.default_rng(0)
    scores = rng.random((10, 3)).astype(np.float64)
    scores /= scores.sum(1, keepdims=True)
    return compute_validation_results(
        DEFAULT_SERIES + ['output_winscores', 'classes_by_f1',
                          'recall_perclass', 'val_counts_perclass'],
        class_labels=['a', 'b', 'c'],
        input_classes=rng.integers(0, 3, 10),
        output_scores=scores,
        image_fullpaths=[f'/data/val/img_{i}.png' for i in range(10)],
        model_id='m1', timestamp='2026-08-16T00:00:00+00:00',
        counts_perclass=[12, 8, 5], val_counts_perclass=[3, 4, 3],
        train_counts_perclass=[9, 4, 2],
        training_image_fullpaths=[f'/data/tr/img_{i}.png' for i in range(15)],
        training_classes=[i % 3 for i in range(15)])


class TestValidationResults:
    def test_default_series_present(self, val_results):
        for key in ['model_id', 'timestamp', 'class_labels', 'input_classes',
                    'output_classes', 'image_basenames', 'output_scores',
                    'confusion_matrix', 'counts_perclass', 'f1_perclass',
                    'f1_weighted', 'f1_macro', 'training_image_basenames',
                    'training_classes']:
            assert key in val_results, key

    def test_confusion_matrix_total(self, val_results):
        assert val_results['confusion_matrix'].sum() == 10

    def test_train_counts_quirk(self):
        """Requesting train_counts_perclass writes val counts under the val key
        (reference quirk, neuston_callbacks.py:98)."""
        r = compute_validation_results(
            ['train_counts_perclass'], class_labels=['a'],
            input_classes=[0], output_scores=[[1.0]],
            image_fullpaths=['x.png'], model_id='m', timestamp='t',
            counts_perclass=[1], val_counts_perclass=[7],
            train_counts_perclass=[9], training_image_fullpaths=['y.png'],
            training_classes=[0])
        assert r['val_counts_perclass'] == [7]
        assert 'train_counts_perclass' not in r

    def test_json_roundtrip(self, val_results, tmp_path):
        out = str(tmp_path / 'r.json')
        save_validation_results(out, val_results)
        with open(out) as f:
            data = json.load(f)
        assert data['class_labels'] == ['a', 'b', 'c']
        assert len(data['output_scores']) == 10

    def test_mat_matlab_one_indexing(self, val_results, tmp_path):
        from scipy.io import loadmat
        out = str(tmp_path / 'r.mat')
        save_validation_results(out, val_results)
        m = loadmat(out)
        # reference ordering: ndarray-typed series (input/output_classes) hit
        # the f4 branch BEFORE the +1 index branch and stay 0-based float32;
        # list-typed index series (training_classes, classes_by_*) get u4 +1
        # (neuston_callbacks.py:132-137)
        assert m['input_classes'].dtype == np.float32
        assert m['input_classes'].min() >= 0
        assert m['output_scores'].dtype == np.float32
        assert m['training_classes'].dtype == np.uint32
        assert m['training_classes'].min() >= 1
        assert m['classes_by_f1'].dtype == np.uint32
        assert m['classes_by_f1'].min() >= 1

    def test_h5_dtypes_and_attrs(self, val_results, tmp_path):
        import h5py
        out = str(tmp_path / 'r.h5')
        save_validation_results(out, val_results)
        with h5py.File(out) as f:
            assert f['output_scores'].dtype == np.float16
            assert f['input_classes'].dtype == np.int16
            assert f['output_scores'].compression == 'gzip'
            assert f['metadata'].attrs['model_id'] == 'm1'
            assert 'f1_weighted' in f['metadata'].attrs
            # h5 keeps 0-based indices (unlike .mat)
            assert f['input_classes'][:].min() >= 0


class TestRunResults:
    def _scores(self, n=4, c=3, seed=1):
        rng = np.random.default_rng(seed)
        s = rng.random((n, c))
        return s / s.sum(1, keepdims=True)

    def test_bin_run_h5(self, tmp_path):
        import h5py
        pid = Pid('D20200301T000000_IFCB900')
        images = [pid.with_target(i + 1) for i in range(4)]
        save_run_results(images, self._scores(), ['a', 'b', 'c'], 'ts',
                         str(tmp_path), 'D{BIN_YEAR}/D{BIN_DATE}/{BIN_ID}_class.h5',
                         model_id='m1', input_obj=pid)
        out = tmp_path / 'D2020' / 'D20200301' / 'D20200301T000000_IFCB900_class.h5'
        assert out.exists()
        with h5py.File(str(out)) as f:
            assert f['metadata'].attrs['bin_id'] == pid.pid
            assert f['metadata'].attrs['version'] == 'v3'
            assert list(f['roi_numbers'][:]) == [1, 2, 3, 4]
            assert f['roi_numbers'].dtype == np.uint16
            assert f['output_scores'].dtype == np.float16
            assert f['output_classes'].dtype == np.float16  # sic, reference parity

    def test_img_run_json(self, tmp_path):
        imgs = ['/d/x1.png', '/d/x2.png', '/d/x3.png', '/d/x4.png']
        save_run_results(imgs, self._scores(), ['a', 'b', 'c'], 'ts',
                         str(tmp_path), 'img_results.json', model_id='m1',
                         input_obj='/d')
        with open(tmp_path / 'img_results.json') as f:
            data = json.load(f)
        assert data['input_images'] == imgs
        assert data['version'] == 'v3'
        assert 'bin_id' not in data

    def test_img_run_h5_no_keyerror(self, tmp_path):
        """Reference bug fixed: img-mode .h5 writes input_images instead of
        raising KeyError on results['bin_id'] (neuston_callbacks.py:264)."""
        import h5py
        imgs = ['/d/x1.png', '/d/x2.png', '/d/x3.png', '/d/x4.png']
        save_run_results(imgs, self._scores(), ['a', 'b', 'c'], 'ts',
                         str(tmp_path), 'r.h5', model_id='m1', input_obj='/d')
        with h5py.File(str(tmp_path / 'r.h5')) as f:
            assert 'input_images' in f

    def test_img_run_input_subdirs_grouping(self, tmp_path):
        src = tmp_path / 'imgs'
        for sub in ['s1', 's2']:
            os.makedirs(src / sub)
        imgs = [str(src / 's1' / 'a.png'), str(src / 's1' / 'b.png'),
                str(src / 's2' / 'c.png'), str(src / 's2' / 'd.png')]
        save_run_results(imgs, self._scores(), ['a', 'b', 'c'], 'ts',
                         str(tmp_path / 'out'), '{INPUT_SUBDIRS}/res.json',
                         model_id='m1', input_obj=str(src))
        for sub, names in [('s1', ['a.png', 'b.png']), ('s2', ['c.png', 'd.png'])]:
            with open(tmp_path / 'out' / sub / 'res.json') as f:
                data = json.load(f)
            assert data['input_images'] == names

    def test_img_input_subdirs_prefix_anchored(self, tmp_path):
        """SRC occurring AGAIN deeper in an image path must not collapse
        the {INPUT_SUBDIRS} namespace — the reference's substring replace
        removed every occurrence (bin mode was fixed in round 3; the img
        arm had silently kept the quirk, QUIRKS.md row updated round 5)."""
        src = tmp_path / 'data'
        deep = src / 'ifcb' / 'data' / 'D2021'
        os.makedirs(deep)
        imgs = [str(deep / f'x{i}.png') for i in range(4)]
        save_run_results(imgs, self._scores(), ['a', 'b', 'c'], 'ts',
                         str(tmp_path / 'out'), '{INPUT_SUBDIRS}/res.json',
                         model_id='m1', input_obj=str(src))
        # prefix-anchored: namespace is /ifcb/data/D2021 (inner 'data'
        # intact), not the collapsed /ifcb/D2021
        good = tmp_path / 'out' / 'ifcb' / 'data' / 'D2021' / 'res.json'
        assert good.exists(), list((tmp_path / 'out').rglob('*'))

    def test_row_count_mismatch_raises(self, tmp_path):
        """score rows != input count must fail loudly — the reference's
        assert compared scores against their own argmax (a tautology), so
        an upstream packing defect silently truncated the img-mode zip."""
        imgs = ['/d/x1.png', '/d/x2.png', '/d/x3.png']  # 3 inputs
        with pytest.raises(ValueError, match='score rows'):
            save_run_results(imgs, self._scores(n=4), ['a', 'b', 'c'],
                             'ts', str(tmp_path), 'r.json',
                             model_id='m1', input_obj='/d')

    def test_validate_outfiles_fails_fast(self):
        """--outfile validation: unsupported extension or typo'd
        placeholder must raise BEFORE inference, like --results/--plot."""
        from ifcb_classifier_tpu.results.run import validate_outfiles
        with pytest.raises(ValueError, match='unsupported result-file'):
            validate_outfiles(['results.csv'])
        with pytest.raises(ValueError, match='unknown placeholder'):
            validate_outfiles(['{BIN_IDX}.json'], src_type='bin')
        with pytest.raises(ValueError, match='unknown placeholder'):
            # bin-only placeholders are invalid in img mode
            validate_outfiles(['{BIN_ID}.json'], src_type='img')
        validate_outfiles(['D{BIN_YEAR}/D{BIN_DATE}/{BIN_ID}_class.h5'])
        validate_outfiles(['{INPUT_SUBDIRS}/r.json'], src_type='img')
        validate_outfiles(['r.mat', 'r.h5', 'r.json'])

    def test_mat_one_indexing(self, tmp_path):
        from scipy.io import loadmat
        pid = Pid('D20200301T000000_IFCB900')
        images = [pid.with_target(i + 1) for i in range(4)]
        save_run_results(images, self._scores(), ['a', 'b', 'c'], 'ts',
                         str(tmp_path), 'out.mat', model_id='m1', input_obj=pid)
        m = loadmat(str(tmp_path / 'out.mat'))
        assert m['output_classes'].min() >= 1
        assert m['output_classes'].dtype == np.uint32
