"""PixWebDataset tar streaming: sharding, shuffle, bad-sample skip, batching."""

import io
import os
import tarfile
import warnings

import numpy as np
import pytest
from PIL import Image

from deco_tpu.data.loader import IterableLoader, make_loader
from deco_tpu.data.webdataset import PixWebDataset


@pytest.fixture(scope="module")
def tar_path(tmp_path_factory):
    root = tmp_path_factory.mktemp("wds")
    path = root / "shard-000000.tar"
    rng = np.random.RandomState(0)
    with tarfile.open(path, "w") as tf:
        for i in range(6):
            img = Image.fromarray(rng.randint(0, 255, (40, 48, 3), np.uint8))
            buf = io.BytesIO()
            img.save(buf, format="JPEG")
            data = buf.getvalue()
            info = tarfile.TarInfo(f"sample{i:04d}.jpg")
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
            cls = str(i % 3).encode()
            info = tarfile.TarInfo(f"sample{i:04d}.cls")
            info.size = len(cls)
            tf.addfile(info, io.BytesIO(cls))
        # a corrupt image member (valid tar, bad JPEG) -> must be skipped
        bad = b"not an image"
        info = tarfile.TarInfo("samplebad.jpg")
        info.size = len(bad)
        tf.addfile(info, io.BytesIO(bad))
    return str(path)


class TestPixWebDataset:
    def test_iterates_with_classes(self, tar_path):
        ds = PixWebDataset(tar_path, resolution=16, is_train=False,
                           process_index=0, process_count=1)
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            samples = list(ds)
        assert len(samples) == 6  # corrupt one skipped
        x, y, md = samples[0]
        assert x.shape == (16, 16, 3) and x.min() >= -1 and x.max() <= 1
        assert md["raw_image"].min() >= 0
        assert sorted(s[1] for s in samples) == [0, 0, 1, 1, 2, 2]

    def test_sharding_disjoint_and_covering(self, tar_path):
        def classes(rank, world):
            ds = PixWebDataset(tar_path, resolution=16, is_train=False,
                               process_index=rank, process_count=world)
            with warnings.catch_warnings():
                warnings.simplefilter("ignore")
                return [s[1] for s in ds]

        r0, r1 = classes(0, 2), classes(1, 2)
        assert len(r0) + len(r1) in (6, 7)  # bad sample counted pre-decode
        assert sorted(r0 + r1) == sorted(classes(0, 1) + [])

    def test_train_shuffle_deterministic(self, tar_path):
        def order(seed):
            ds = PixWebDataset(tar_path, resolution=16, is_train=True,
                               buffer_size=4, random_seed=seed,
                               process_index=0, process_count=1)
            with warnings.catch_warnings():
                warnings.simplefilter("ignore")
                return [s[1] for s in ds]

        assert order(1) == order(1)
        assert sorted(order(1)) == sorted(order(2))

    def test_missing_shard_raises(self):
        with pytest.raises(FileNotFoundError):
            PixWebDataset("/nonexistent/shard.tar", process_index=0,
                          process_count=1)


class TestIterableLoader:
    def test_batching_through_make_loader(self, tar_path):
        ds = PixWebDataset(tar_path, resolution=16, is_train=False,
                           process_index=0, process_count=1)
        loader = make_loader(ds, batch_size=2, shuffle=False, num_workers=2)
        assert isinstance(loader, IterableLoader)
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            batches = list(loader)
        assert len(batches) == 3
        x, y, md = batches[0]
        assert x.shape == (2, 16, 16, 3)
        assert md["raw_image"].shape == (2, 16, 16, 3)
        assert y.dtype == np.int64
