"""Dataset loaders (CIFAR-10 / CelebA / LSUN / FFHQ) and their transforms.

Native re-implementation of the reference's dataset stack
(ddim/datasets/__init__.py get_dataset + celeba.py / lsun.py / ffhq.py):
the same per-dataset preprocessing — CelebA's (cx=89, cy=121) 128x128 face
crop, LSUN's shorter-side resize + center crop, FFHQ's per-resolution lmdb
keys and the seed-2019 90/10 split — but torch-free: PIL + numpy in, NHWC
float32 [0, 1] arrays out, ready for `data.data_transform` and jitted
batching on device.

Artifacts are local (zero-egress deployments): CIFAR-10 reads the standard
`cifar-10-batches-py` pickle folder; CelebA reads the `img_align_celeba`
image folder (+ `list_eval_partition.txt` when present); LSUN and FFHQ
read their lmdb databases (requires the `lmdb` package, gated with a
clear error — not installed in every environment).

The reference uses these only for training and FID-reference statistics;
the PTQ flow consumes generated calibration trajectories, so these loaders
exist for inventory parity and FID-stats tooling.
"""

from __future__ import annotations

import dataclasses
import pickle
from pathlib import Path
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np

__all__ = [
    "Crop", "resize_short", "center_crop", "to_array",
    "CIFAR10", "ArtCIFAR10", "ImageFolder", "CelebA", "LSUN", "FFHQ",
    "get_dataset", "iter_batches",
]


# ---------------------------------------------------------------------------
# transforms (torchvision semantics on PIL images)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class Crop:
    """F.crop(img, x1, y1, x2-x1, y2-y1) — the reference's CelebA crop
    (ddim/datasets/__init__.py:15-28): x is the row axis."""

    x1: int
    x2: int
    y1: int
    y2: int

    def __call__(self, img):
        return img.crop((self.y1, self.x1, self.y2, self.x2))


def resize_short(img, size: int):
    """torchvision Resize(int): shorter side -> size, keep aspect ratio."""
    from PIL import Image

    w, h = img.size
    if min(w, h) == size:
        return img
    if w < h:
        return img.resize((size, int(round(h * size / w))), Image.BILINEAR)
    return img.resize((int(round(w * size / h)), size), Image.BILINEAR)


def center_crop(img, size: int):
    w, h = img.size
    left = int(round((w - size) / 2.0))
    top = int(round((h - size) / 2.0))
    return img.crop((left, top, left + size, top + size))


def to_array(img) -> np.ndarray:
    """PIL -> HWC float32 [0,1] (ToTensor without the CHW transpose)."""
    a = np.asarray(img.convert("RGB"), np.float32) / 255.0
    return a


# ---------------------------------------------------------------------------
# datasets
# ---------------------------------------------------------------------------


class CIFAR10:
    """Reads the standard `cifar-10-batches-py` pickle folder (the file
    torchvision downloads; URL in its docs — external artifact here).
    Items: (HWC float32 [0,1] at 32x32, label)."""

    TRAIN_FILES = [f"data_batch_{i}" for i in range(1, 6)]
    TEST_FILES = ["test_batch"]
    FOLDER = "cifar-10-batches-py"

    def __init__(self, root, train: bool = True, image_size: int = 32):
        base = Path(root)
        if (base / self.FOLDER).exists():
            base = base / self.FOLDER
        files = self.TRAIN_FILES if train else self.TEST_FILES
        data, labels = [], []
        for f in files:
            p = base / f
            if not p.exists():
                raise FileNotFoundError(
                    f"{p} missing — point root at a {self.FOLDER} "
                    "folder (the standard CIFAR-10 python archive layout)")
            with open(p, "rb") as fh:
                d = pickle.load(fh, encoding="bytes")
            data.append(d[b"data"])
            # fail at load time on a batch with neither key (torchvision,
            # which the reference's loaders inherit, raises KeyError here;
            # a silent [] default would surface later as an IndexError in
            # __getitem__, far from the cause)
            labels.extend(d[b"labels"] if b"labels" in d
                          else d[b"fine_labels"])
        raw = np.concatenate(data).reshape(-1, 3, 32, 32)
        self.images = np.transpose(raw, (0, 2, 3, 1)).astype(np.float32) / 255.0
        self.labels = np.asarray(labels, np.int32)
        self.image_size = image_size

    def __len__(self):
        return len(self.images)

    def __getitem__(self, i) -> Tuple[np.ndarray, int]:
        img = self.images[i]
        if self.image_size != 32:
            from PIL import Image

            pil = Image.fromarray((img * 255).astype(np.uint8))
            img = to_array(resize_short(pil, self.image_size))
        return img, int(self.labels[i])


class ArtCIFAR10(CIFAR10):
    """artCIFAR10 (reference ddim/datasets/artcifar10.py): the CIFAR-10
    pickle layout under an `artcifar-10-batches-py` folder; the meta
    record keys style names instead of class names, which the loaders
    never read. Same 5 train batches + 1 test batch."""

    FOLDER = "artcifar-10-batches-py"


class ImageFolder:
    """Folder of images -> (HWC float32, 0) with a transform chain."""

    EXTS = (".png", ".jpg", ".jpeg", ".webp")

    def __init__(self, root, transforms: Sequence = ()):
        self.files: List[Path] = sorted(
            p for p in Path(root).iterdir() if p.suffix.lower() in self.EXTS)
        if not self.files:
            raise FileNotFoundError(f"no images in {root}")
        self.transforms = list(transforms)

    def __len__(self):
        return len(self.files)

    def __getitem__(self, i) -> Tuple[np.ndarray, int]:
        from PIL import Image

        img = Image.open(self.files[i])
        for t in self.transforms:
            img = t(img)
        return to_array(img), 0


class CelebA(ImageFolder):
    """CelebA aligned faces: the reference's (cx=89, cy=121) 128x128 crop
    then resize (ddim/datasets/__init__.py:76-99). Reads the standard
    `img_align_celeba` folder; `list_eval_partition.txt` selects the
    train(0)/valid(1)/test(2) split when present."""

    SPLITS = {"train": 0, "valid": 1, "test": 2}

    def __init__(self, root, split: str = "train", image_size: int = 64):
        root = Path(root)
        folder = (root / "img_align_celeba"
                  if (root / "img_align_celeba").exists() else root)
        cx, cy = 89, 121
        crop = Crop(cy - 64, cy + 64, cx - 64, cx + 64)
        super().__init__(folder, [crop, lambda im: resize_short(im,
                                                                image_size)])
        part = root / "list_eval_partition.txt"
        if part.exists():
            want = self.SPLITS[split]
            keep = {name for line in part.read_text().splitlines()
                    if line.strip()
                    for name, p in [line.split()] if int(p) == want}
            self.files = [f for f in self.files if f.name in keep]


class _LMDBDataset:
    def __init__(self, path):
        try:
            import lmdb
        except ImportError as e:
            raise ImportError(
                "LSUN/FFHQ read lmdb databases; the `lmdb` package is not "
                "installed in this environment") from e
        self.env = lmdb.open(str(path), max_readers=32, readonly=True,
                             lock=False, readahead=False, meminit=False)


class LSUN(_LMDBDataset):
    """LSUN scene category lmdb (reference ddim/datasets/lsun.py):
    shorter-side resize + center crop to image_size."""

    def __init__(self, root, category: str = "bedroom_train",
                 image_size: int = 256):
        path = Path(root) / f"{category}_lmdb"
        super().__init__(path if path.exists() else Path(root) / category)
        with self.env.begin(write=False) as txn:
            self.length = txn.stat()["entries"]
            self.keys = [k for k, _ in txn.cursor()]
        self.image_size = image_size

    def __len__(self):
        return self.length

    def __getitem__(self, i) -> Tuple[np.ndarray, int]:
        import io

        from PIL import Image

        with self.env.begin(write=False) as txn:
            buf = txn.get(self.keys[i])
        img = Image.open(io.BytesIO(buf))
        img = center_crop(resize_short(img, self.image_size),
                          self.image_size)
        return to_array(img), 0


class FFHQ(_LMDBDataset):
    """FFHQ per-resolution lmdb (reference ddim/datasets/ffhq.py):
    keys '{resolution}-{index:05d}', length from the 'length' record."""

    def __init__(self, root, resolution: int = 256):
        super().__init__(root)
        with self.env.begin(write=False) as txn:
            self.length = int(txn.get(b"length").decode())
        self.resolution = resolution

    def __len__(self):
        return self.length

    def __getitem__(self, i) -> Tuple[np.ndarray, int]:
        import io

        from PIL import Image

        with self.env.begin(write=False) as txn:
            buf = txn.get(f"{self.resolution}-{str(i).zfill(5)}".encode())
        return to_array(Image.open(io.BytesIO(buf))), 0


def ffhq_split_indices(n: int) -> Tuple[np.ndarray, np.ndarray]:
    """The reference's deterministic seed-2019 90/10 FFHQ split
    (ddim/datasets/__init__.py:181-191)."""
    rs = np.random.RandomState(2019)
    idx = np.arange(n)
    rs.shuffle(idx)
    cut = int(n * 0.9)
    return idx[:cut], idx[cut:]


def get_dataset(name: str, root, *, image_size: int, split: str = "train",
                category: str = "bedroom"):
    """Reference get_dataset dispatch (test-transform path: PTQ never
    trains, so random flips are the caller's business)."""
    name = name.upper()
    if name == "CIFAR10":
        return CIFAR10(root, train=split == "train", image_size=image_size)
    if name == "ARTCIFAR10":
        return ArtCIFAR10(root, train=split == "train",
                          image_size=image_size)
    if name == "CELEBA":
        return CelebA(root, split=split, image_size=image_size)
    if name == "LSUN":
        return LSUN(root, category=f"{category}_{split}",
                    image_size=image_size)
    if name == "FFHQ":
        return FFHQ(root, resolution=image_size)
    raise ValueError(f"unknown dataset {name}")


def iter_batches(dataset, batch_size: int, *,
                 indices: Optional[Sequence[int]] = None,
                 drop_last: bool = False) -> Iterator[np.ndarray]:
    """(N, H, W, C) float32 [0,1] batches — feed data.data_transform."""
    order = np.asarray(indices) if indices is not None \
        else np.arange(len(dataset))
    for i in range(0, len(order), batch_size):
        chunk = order[i: i + batch_size]
        if drop_last and len(chunk) < batch_size:
            return
        yield np.stack([dataset[int(j)][0] for j in chunk])
