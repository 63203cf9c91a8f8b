"""Tests for built-in dataset wrappers on tiny generated fixtures."""

import json
import os

import numpy as np
import pytest

from mmlearn_tpu.datasets.builtin import (
    CheXpert,
    ImageNet,
    ImageTransform,
    LLVIP,
    NIHCXR,
    NYUv2,
)
from mmlearn_tpu.datasets.core import Example


def _write_img(path, size=(40, 48), value=128, mode="RGB"):
    from PIL import Image

    os.makedirs(os.path.dirname(path), exist_ok=True)
    arr = np.full(size + ((3,) if mode == "RGB" else ()), value, np.uint8)
    Image.fromarray(arr, mode=mode if mode != "I" else None).save(path)


def test_image_transform_shapes():
    t = ImageTransform(size=16)
    img = np.random.default_rng(0).integers(0, 255, (33, 47, 3)).astype(np.uint8)
    out = t(img)
    assert out.shape == (16, 16, 3)
    t_train = ImageTransform(size=16, train=True)
    out = t_train(img, rng=np.random.default_rng(0))
    assert out.shape == (16, 16, 3)
    # grayscale input broadcast to 3 channels
    out = t(img[..., 0])
    assert out.shape == (16, 16, 3)


def test_imagenet_folder(tmp_path):
    root = tmp_path / "imagenet"
    for cls in ("n01", "n02"):
        for i in range(2):
            _write_img(str(root / "train" / cls / f"{i}.jpg"))
    (root / "id2label.json").write_text(json.dumps(["tench", "goldfish"]))
    ds = ImageNet(root_dir=str(root), split="train", image_size=16)
    assert len(ds) == 4
    ex = ds[0]
    assert isinstance(ex, Example)
    assert ex["rgb"].shape == (16, 16, 3)
    assert ex["rgb_target"] == 0
    assert ds.id2label == {0: "tench", 1: "goldfish"}
    assert len(ds.zero_shot_prompt_templates) == 80


def test_imagenet_manifest_cache(tmp_path):
    """manifest_cache=True persists the directory walk: later constructions
    read the manifest instead of rescanning (and so see its contents even
    if the tree changed — delete the manifest to refresh)."""
    root = tmp_path / "imagenet"
    for cls in ("n01", "n02"):
        for i in range(2):
            _write_img(str(root / "train" / cls / f"{i}.jpg"))
    ds = ImageNet(
        root_dir=str(root), split="train", image_size=16, manifest_cache=True
    )
    manifest = root / "train" / ".mmlearn_manifest.json"
    assert manifest.is_file()
    assert len(ds) == 4

    # add a file: the cached manifest intentionally wins...
    _write_img(str(root / "train" / "n01" / "late.jpg"))
    ds2 = ImageNet(
        root_dir=str(root), split="train", image_size=16, manifest_cache=True
    )
    assert len(ds2) == 4
    assert [s for s in ds2.samples] == [s for s in ds.samples]
    assert ds2[3]["rgb"].shape == (16, 16, 3)  # paths resolve and decode

    # ...manifest_cache=False (the default) always rescans
    assert len(ImageNet(root_dir=str(root), split="train")) == 5
    # a corrupt manifest falls back to rescanning (and rewrites)
    manifest.write_text("{not json")
    ds3 = ImageNet(
        root_dir=str(root), split="train", image_size=16, manifest_cache=True
    )
    assert len(ds3) == 5
    assert json.loads(manifest.read_text())["classes"] == ["n01", "n02"]


def test_imagenet_mask_generator(tmp_path):
    from mmlearn_tpu.datasets.processors.masking import (
        BlockwiseImagePatchMaskGenerator,
    )

    root = tmp_path / "imagenet"
    _write_img(str(root / "train" / "n01" / "0.jpg"))
    gen = BlockwiseImagePatchMaskGenerator(input_size=2, num_masking_patches=2)
    ds = ImageNet(root_dir=str(root), split="train", image_size=16,
                  mask_generator=gen)
    ex = ds[0]
    assert ex["rgb_mask"].shape == (4,)
    assert ex["rgb_mask"].sum() == 2


def test_chexpert_manifest(tmp_path):
    root = tmp_path / "chexpert"
    _write_img(str(root / "imgs" / "a.jpg"))
    manifest = [{"image_path": "imgs/a.jpg", "label": [0.0] * 14}]
    root.mkdir(exist_ok=True)
    (root / "chexpert_train_data.json").write_text(json.dumps(manifest))
    ds = CheXpert(root_dir=str(root), split="train", image_size=16)
    ex = ds[0]
    assert ex["rgb"].shape == (16, 16, 3)
    assert ex["rgb_target"].shape == (14,)
    # valid split reads the labeler-less radiologist manifest
    # (reference chexpert.py:76-80)
    (root / "valid_data.json").write_text(json.dumps(manifest))
    assert len(CheXpert(root_dir=str(root), split="valid", image_size=16)) == 1
    # train without a labeler is a clear validation error, not a
    # FileNotFoundError for 'None_train_data.json'
    with pytest.raises(ValueError, match="requires a labeler"):
        CheXpert(root_dir=str(root), split="train", labeler=None)


def test_nihcxr_manifest(tmp_path):
    root = tmp_path / "nih"
    _write_img(str(root / "imgs" / "a.png"))
    (root / "train_data.json").write_text(
        json.dumps([{"image_path": "imgs/a.png", "label": [1.0, 0.0]}])
    )
    ds = NIHCXR(root_dir=str(root), split="train", image_size=16)
    np.testing.assert_array_equal(ds[0]["rgb_target"], [1.0, 0.0])


def test_llvip_pairs_and_bboxes(tmp_path):
    root = tmp_path / "llvip"
    _write_img(str(root / "visible" / "train" / "1.jpg"))
    _write_img(str(root / "infrared" / "train" / "1.jpg"), value=30)
    (root / "Annotations").mkdir()
    (root / "Annotations" / "1.xml").write_text(
        "<annotation><object><bndbox><xmin>1</xmin><ymin>2</ymin>"
        "<xmax>3</xmax><ymax>4</ymax></bndbox></object></annotation>"
    )
    ds = LLVIP(root_dir=str(root), train=True, include_bboxes=True,
               image_size=16)
    ex = ds[0]
    assert ex["rgb"].shape == (16, 16, 3)
    assert ex["thermal"].shape == (16, 16, 3)
    np.testing.assert_array_equal(ex["bboxes"][0], [1, 2, 3, 4])
    assert (ex["bboxes"][1:] == -1).all()


def test_builtin_datasets_preserve_uint8_contract(tmp_path):
    """A ``device_normalize=True`` transform emits uint8 and the dataset
    wrapper must pass it through untouched (the trainer normalizes on
    device); a float transform still yields float32."""
    root = tmp_path / "chexpert"
    _write_img(str(root / "imgs" / "a.jpg"))
    root.mkdir(exist_ok=True)
    (root / "chexpert_train_data.json").write_text(
        json.dumps([{"image_path": "imgs/a.jpg", "label": [0.0] * 14}])
    )
    ds_u8 = CheXpert(
        root_dir=str(root), split="train",
        transform=ImageTransform(size=16, device_normalize=True),
    )
    assert ds_u8[0]["rgb"].dtype == np.uint8
    ds_f32 = CheXpert(root_dir=str(root), split="train", image_size=16)
    assert ds_f32[0]["rgb"].dtype == np.float32


def test_nyuv2(tmp_path):
    from PIL import Image

    root = tmp_path / "nyu"
    _write_img(str(root / "train" / "rgb" / "0001.png"))
    depth_dir = root / "train" / "depth"
    depth_dir.mkdir(parents=True)
    depth = np.full((40, 48), 2000, np.int32)  # 2 m in mm
    Image.fromarray(depth, mode="I").save(str(depth_dir / "0001.png"))
    # reference on-disk protocol (nyuv2.py:117-128): {split}.txt id list +
    # per-file scene_class/<id>.txt
    (root / "train.txt").write_text("0001\n")
    scene_dir = root / "train" / "scene_class"
    scene_dir.mkdir(parents=True)
    (scene_dir / "0001.txt").write_text("kitchen")
    ds = NYUv2(root_dir=str(root), split="train", image_size=16)
    ex = ds[0]
    assert ex["rgb"].shape == (16, 16, 3)
    assert ex["depth"].shape == (16, 16, 1)
    assert ex["depth_target"] == 1  # "kitchen" in the fixed 10-label list
    assert abs(float(ex["depth"].max()) - 2.0) < 1e-5  # clipped meters


def test_librispeech_layout_and_padding(tmp_path, monkeypatch):
    """Manifest walking + pad_or_trim to 30 s @ 16 kHz (decode monkeypatched:
    soundfile isn't installed here; the reference gets decoding from
    torchaudio — reference librispeech.py:107-121)."""
    from mmlearn_tpu.datasets.builtin import librispeech as ls

    chap = tmp_path / "train-clean-100" / "19" / "198"
    chap.mkdir(parents=True)
    (chap / "19-198.trans.txt").write_text(
        "19-198-0000 HELLO WORLD\n19-198-0001 SECOND UTTERANCE\n"
    )
    for utt in ("19-198-0000", "19-198-0001"):
        (chap / f"{utt}.flac").write_bytes(b"fake")

    lengths = {"19-198-0000": 16000 * 2, "19-198-0001": 16000 * 40}

    def fake_load(path):
        utt = os.path.splitext(os.path.basename(path))[0]
        return np.ones(lengths[utt], np.float32)

    monkeypatch.setattr(ls.LibriSpeech, "_load_audio", staticmethod(fake_load))
    ds = ls.LibriSpeech(root_dir=str(tmp_path), split="train-clean-100")
    assert len(ds) == 2

    short = ds[0]
    assert short["audio"].shape == (16000 * 30, 1)  # padded to 30 s
    assert short["text"] == "HELLO WORLD"
    assert short["audio"][:16000 * 2].sum() == 16000 * 2  # signal kept
    assert short["audio"][16000 * 2:].sum() == 0  # zero padding

    long = ds[1]
    assert long["audio"].shape == (16000 * 30, 1)  # trimmed from 40 s
    assert long["audio"].sum() == 16000 * 30
