"""Data layer: datasets, paired augmentation, sharded loader."""
import os
from os import path

import numpy as np
import pytest
from PIL import Image

from mivos_tpu.data import (DAVISTestDataset, FusionDataset, Loader,
                            ShardedSampler, all_to_onehot, collate,
                            im_denormalize, im_normalize)
from mivos_tpu.data.transforms import (AugParams, apply_color_jitter,
                                       apply_geometric)

H, W = 100, 140
_PALETTE = [0, 0, 0, 128, 0, 0, 0, 128, 0] + [0] * (256 * 3 - 9)


def _save_p(lab, p):
    img = Image.fromarray(lab, mode="P")
    img.putpalette(_PALETTE)
    img.save(p)


def _write_davis(root, videos=("blackswan", "camel"), t=4, k=2):
    rng = np.random.RandomState(0)
    for split in ["JPEGImages/480p", "Annotations/480p"]:
        for v in videos:
            os.makedirs(path.join(root, split, v), exist_ok=True)
    os.makedirs(path.join(root, "ImageSets/2017"), exist_ok=True)
    with open(path.join(root, "ImageSets/2017/val.txt"), "w") as f:
        f.write("\n".join(videos) + "\n")
    for v in videos:
        for f in range(t):
            im = rng.randint(0, 255, (H, W, 3), np.uint8)
            Image.fromarray(im).save(
                path.join(root, "JPEGImages/480p", v, f"{f:05d}.jpg"))
            lab = np.zeros((H, W), np.uint8)
            lab[10:40, 20:60] = 1
            if k > 1:
                lab[50:80, 70:110] = 2
            _save_p(lab, path.join(root, "Annotations/480p", v,
                                   f"{f:05d}.png"))
    return [str(v) for v in videos]


def _write_fusion_data(tmp, video="blackswan", t=8, objs=(1, 2)):
    """Reference filesystem contract fd_root/<run>/<video>/<ref>/<obj>/
    <frame>.png (fusion_dataset.py:38-50)."""
    im_root = path.join(tmp, "JPEGImages")
    gt_root = path.join(tmp, "Annotations")
    fd_root = path.join(tmp, "fusion_data")
    rng = np.random.RandomState(1)
    os.makedirs(path.join(im_root, video))
    os.makedirs(path.join(gt_root, video))
    for f in range(t):
        Image.fromarray(rng.randint(0, 255, (480, 520, 3), np.uint8)).save(
            path.join(im_root, video, f"{f:05d}.jpg"))
        lab = np.zeros((480, 520), np.uint8)
        lab[100:300, 100:300] = 1
        lab[320:460, 320:500] = 2
        _save_p(lab, path.join(gt_root, video, f"{f:05d}.png"))
    # ref-frame and object folders use %05d names
    # (reference generate_fusion.py:94,109).
    for ref in (0, t - 1):
        for obj in objs:
            d = path.join(fd_root, "run0", video, f"{ref:05d}",
                          f"{obj:05d}")
            os.makedirs(d)
            for f in range(t):
                m = (rng.rand(480, 520) * 255).astype(np.uint8)
                Image.fromarray(m).save(path.join(d, f"{f:05d}.png"))
    return im_root, gt_root, fd_root


class TestTransforms:
    def test_normalize_roundtrip(self, rng):
        img = rng.rand(8, 8, 3).astype(np.float32)
        back = im_denormalize(im_normalize(img))
        np.testing.assert_allclose(back, img, atol=1e-5)

    def test_all_to_onehot(self):
        lab = np.asarray([[[0, 1], [2, 1]]], np.uint8)
        oh = all_to_onehot(lab, [1, 2])
        assert oh.shape == (2, 1, 2, 2)
        assert oh[0].sum() == 2 and oh[1].sum() == 1

    def test_paired_geometric_is_consistent(self, rng):
        """Image and mask streams share one AugParams: a mask computed
        before augmentation equals the mask of the augmented image."""
        g = np.random.default_rng(0)
        img = rng.rand(H, W, 3).astype(np.float32)
        mask = (img[..., 0] > 0.5).astype(np.uint8)
        p = AugParams.sample(g, H, W, crop_size=64)
        ai, am = apply_geometric(img, p), apply_geometric(mask, p)
        np.testing.assert_array_equal((ai[..., 0] > 0.5).astype(np.uint8), am)
        assert ai.shape == (64, 64, 3)

    def test_color_jitter_stays_in_range(self, rng):
        g = np.random.default_rng(3)
        img = rng.rand(32, 32, 3).astype(np.float32)
        p = AugParams.sample(g, 32, 32)
        out = apply_color_jitter(img, p)
        assert out.min() >= 0 and out.max() <= 1 + 1e-4


class TestDAVISTestDataset:
    def test_loads_video_nhwc_onehot(self, tmp_path):
        videos = _write_davis(str(tmp_path))
        ds = DAVISTestDataset(str(tmp_path))
        assert len(ds) == len(videos)
        d = ds[0]
        assert d["rgb"].shape == (4, H, W, 3)
        assert d["gt"].shape == (2, 4, H, W, 1)
        assert d["info"]["labels"] == [1, 2]

    def test_single_object_collapses_labels(self, tmp_path):
        _write_davis(str(tmp_path))
        ds = DAVISTestDataset(str(tmp_path), single_object=True)
        d = ds[0]
        assert d["gt"].shape[0] == 1
        assert set(np.unique(d["gt"])) <= {0.0, 1.0}


class TestFusionDataset:
    def test_sample_contract(self, tmp_path):
        im_root, gt_root, fd_root = _write_fusion_data(str(tmp_path))
        ds = FusionDataset(im_root, gt_root, fd_root, seed=7)
        assert len(ds) == 1
        d = ds[0]
        for key in ["rgb", "src2_ref_im"]:
            assert d[key].shape == (384, 384, 3), key
        for key in ["gt", "gt2", "seg1", "seg2", "seg12", "seg22",
                    "src2_ref", "src2_ref2", "src2_ref_gt",
                    "src2_ref_gt2"]:
            assert d[key].shape == (384, 384, 1), key
        assert d["cls_gt"].shape == (384, 384)
        assert d["dist"].shape == (2,) and 0 <= d["dist"][0] <= 1
        assert d["selector"].tolist() == [1.0, 1.0]

    def test_deterministic_per_epoch(self, tmp_path):
        im_root, gt_root, fd_root = _write_fusion_data(str(tmp_path))
        ds = FusionDataset(im_root, gt_root, fd_root, seed=7)
        a, b = ds[0], ds[0]
        np.testing.assert_array_equal(a["rgb"], b["rgb"])
        ds.set_epoch(1)
        c = ds[0]
        assert not np.array_equal(a["rgb"], c["rgb"])


class TestLoader:
    def test_sharded_sampler_partitions(self):
        shards = [list(ShardedSampler(10, num_shards=2, shard=s,
                                      shuffle=False)) for s in range(2)]
        assert sorted(shards[0] + shards[1]) == sorted(list(range(10)))
        assert len(shards[0]) == len(shards[1]) == 5

    def test_sampler_epoch_reshuffle(self):
        s = ShardedSampler(32, seed=1)
        e0 = list(s)
        s.set_epoch(1)
        assert e0 != list(s) and sorted(e0) == list(range(32))

    def test_loader_batches_in_order(self):
        class Squares:
            def __len__(self):
                return 13

            def __getitem__(self, i):
                return {"x": np.asarray([i * i], np.float32),
                        "info": {"i": i}}

        loader = Loader(Squares(), batch_size=4, num_workers=3,
                        sampler=ShardedSampler(13, shuffle=False),
                        drop_last=True)
        batches = list(loader)
        assert len(batches) == len(loader) == 3
        got = np.concatenate([b["x"][:, 0] for b in batches])
        np.testing.assert_array_equal(got, np.arange(12) ** 2)
        assert batches[0]["info"][1] == {"i": 1}

    def test_collate_stacks(self):
        out = collate([{"a": np.zeros((2,))}, {"a": np.ones((2,))}])
        assert out["a"].shape == (2, 2)


class TestYouTubeVOSDataset:
    def test_sparse_gt_and_label_mapping(self, tmp_path, rng):
        """YV: sparse annotations, raw->dense label maps, 480p resize
        (reference yv_test_dataset.py:16-122)."""
        from mivos_tpu.data import YouTubeVOSTestDataset

        img_dir = tmp_path / "vos/all_frames/valid/JPEGImages/vid0"
        msk_dir = tmp_path / "vos/valid/Annotations/vid0"
        os.makedirs(img_dir)
        os.makedirs(msk_dir)
        h, w, t = 120, 200, 4
        for f in range(t):
            Image.fromarray(rng.randint(0, 255, (h, w, 3), np.uint8)).save(
                img_dir / f"{f:05d}.jpg")
        # GT only on frames 0 and 2, with sparse raw labels {3, 7}
        for f, labs in [(0, [3]), (2, [3, 7])]:
            lab = np.zeros((h, w), np.uint8)
            lab[10:50, 20:80] = labs[0]
            if len(labs) > 1:
                lab[60:110, 100:180] = labs[1]
            _save_p(lab, str(msk_dir / f"{f:05d}.png"))

        ds = YouTubeVOSTestDataset(str(tmp_path), split="valid")
        d = ds[0]
        # short side resized to 480
        assert min(d["rgb"].shape[1:3]) == 480
        assert d["gt"].shape[0] == 2  # two raw labels
        info = d["info"]
        assert info["label_convert"] == {3: 1, 7: 2}
        assert info["label_backward"] == {1: 3, 2: 7}
        assert set(info["gt_obj"].keys()) == {0, 2}
        # annotated frames carry mask, others zero
        assert d["gt"][:, 1].sum() == 0 and d["gt"][:, 0].sum() > 0
