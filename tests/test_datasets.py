"""Dataset loaders: synthetic fixtures exercising the reference semantics
(CIFAR-10 pickle format, CelebA crop + split file, transform parity vs
torchvision conventions, FFHQ split determinism)."""

import pickle

import numpy as np
import pytest
from PIL import Image

from qdiffusion_tpu.datasets import (
    CIFAR10,
    ArtCIFAR10,
    CelebA,
    Crop,
    center_crop,
    ffhq_split_indices,
    get_dataset,
    iter_batches,
    resize_short,
)


@pytest.fixture()
def cifar_dir(tmp_path):
    rng = np.random.default_rng(0)
    d = tmp_path / "cifar-10-batches-py"
    d.mkdir()
    for name, n in [(f"data_batch_{i}", 20) for i in range(1, 6)] + [
            ("test_batch", 10)]:
        data = rng.integers(0, 256, size=(n, 3072), dtype=np.int64)
        with open(d / name, "wb") as f:
            pickle.dump({b"data": data.astype(np.uint8),
                         b"labels": list(rng.integers(0, 10, n))}, f)
    return tmp_path


def test_cifar10_pickle_format(cifar_dir):
    ds = CIFAR10(cifar_dir, train=True)
    assert len(ds) == 100
    img, label = ds[0]
    assert img.shape == (32, 32, 3) and img.dtype == np.float32
    assert 0.0 <= img.min() and img.max() <= 1.0
    assert 0 <= label < 10
    test = CIFAR10(cifar_dir, train=False)
    assert len(test) == 10


def test_cifar10_channel_layout(cifar_dir):
    """CIFAR pickles are CHW planes; loader must emit HWC."""
    ds = CIFAR10(cifar_dir, train=False)
    with open(cifar_dir / "cifar-10-batches-py" / "test_batch", "rb") as f:
        raw = pickle.load(f, encoding="bytes")[b"data"][0]
    expected = raw.reshape(3, 32, 32).transpose(1, 2, 0) / 255.0
    np.testing.assert_allclose(ds[0][0], expected.astype(np.float32))


def test_artcifar10_folder_and_dispatch(tmp_path):
    """artCIFAR10 (ddim/datasets/artcifar10.py): CIFAR pickle layout under
    artcifar-10-batches-py; get_dataset dispatches on 'artCIFAR10'
    (ddim/datasets/__init__.py:62-75)."""
    rng = np.random.default_rng(2)
    d = tmp_path / "artcifar-10-batches-py"
    d.mkdir()
    for name, n in [(f"data_batch_{i}", 6) for i in range(1, 6)] + [
            ("test_batch", 4)]:
        data = rng.integers(0, 256, size=(n, 3072), dtype=np.uint8)
        with open(d / name, "wb") as f:
            pickle.dump({b"data": data,
                         b"labels": list(rng.integers(0, 10, n))}, f)
    ds = ArtCIFAR10(tmp_path, train=True)
    assert len(ds) == 30
    img, label = ds[0]
    assert img.shape == (32, 32, 3) and img.dtype == np.float32
    # CIFAR10 must NOT find the art folder (distinct base_folder names)
    with pytest.raises(FileNotFoundError):
        CIFAR10(tmp_path, train=True)
    via = get_dataset("artCIFAR10", tmp_path, image_size=32, split="test")
    assert isinstance(via, ArtCIFAR10) and len(via) == 4


def test_celeba_crop_and_split(tmp_path):
    rng = np.random.default_rng(1)
    root = tmp_path / "celeba"
    folder = root / "img_align_celeba"
    folder.mkdir(parents=True)
    names = []
    for i in range(6):
        # CelebA aligned images are 178x218 (WxH)
        arr = rng.integers(0, 256, size=(218, 178, 3), dtype=np.uint8)
        name = f"{i:06d}.jpg"
        Image.fromarray(arr).save(folder / name)
        names.append(name)
    (root / "list_eval_partition.txt").write_text("\n".join(
        f"{n} {0 if i < 4 else 2}" for i, n in enumerate(names)))

    train = CelebA(root, split="train", image_size=64)
    test = CelebA(root, split="test", image_size=64)
    assert len(train) == 4 and len(test) == 2
    img, _ = train[0]
    assert img.shape == (64, 64, 3)

    # crop parity: reference crops rows [cy-64, cy+64), cols [cx-64, cx+64)
    pil = Image.open(folder / names[0])
    ref = np.asarray(pil)[121 - 64:121 + 64, 89 - 64:89 + 64]
    got = np.asarray(Crop(121 - 64, 121 + 64, 89 - 64, 89 + 64)(pil))
    np.testing.assert_array_equal(got, ref)


def test_resize_short_and_center_crop():
    img = Image.fromarray(np.zeros((100, 200, 3), np.uint8))  # HxW 100x200
    r = resize_short(img, 50)
    assert r.size == (100, 50)  # PIL size is (W, H): aspect kept
    c = center_crop(r, 50)
    assert c.size == (50, 50)


def test_ffhq_split_deterministic():
    tr, te = ffhq_split_indices(100)
    tr2, te2 = ffhq_split_indices(100)
    np.testing.assert_array_equal(tr, tr2)
    assert len(tr) == 90 and len(te) == 10
    assert set(tr) | set(te) == set(range(100))
    # the reference's seed-2019 shuffle: first index is stable
    rs = np.random.RandomState(2019)
    idx = np.arange(100)
    rs.shuffle(idx)
    np.testing.assert_array_equal(tr, idx[:90])


def test_get_dataset_dispatch_and_batches(cifar_dir):
    ds = get_dataset("cifar10", cifar_dir, image_size=32, split="test")
    batches = list(iter_batches(ds, 4))
    assert [b.shape for b in batches] == [(4, 32, 32, 3)] * 2 + [(2, 32, 32, 3)]
    batches = list(iter_batches(ds, 4, drop_last=True))
    assert len(batches) == 2


def test_lsun_requires_lmdb(tmp_path):
    from qdiffusion_tpu.datasets import LSUN

    try:
        import lmdb  # noqa: F401
        pytest.skip("lmdb installed; gating not applicable")
    except ImportError:
        pass
    (tmp_path / "bedroom_train_lmdb").mkdir()
    with pytest.raises(ImportError, match="lmdb"):
        LSUN(tmp_path, category="bedroom_train")
