"""Data pipeline: gif/mp4 codecs round-trip, datasets, loader collation."""

import numpy as np
import pytest

from magvit2_pytorch_tpu.data import (
    DataLoader,
    ImageDataset,
    VideoDataset,
    cast_num_frames,
    gif_to_array,
    video_array_to_gif,
    video_to_array,
    array_to_video,
    random_split,
)


def _synthetic_video(t=5, h=24, w=24, c=3, seed=0):
    rng = np.random.default_rng(seed)
    return rng.uniform(size=(t, h, w, c)).astype(np.float32)


def test_gif_roundtrip(tmp_path):
    video = _synthetic_video()
    path = tmp_path / 'test.gif'
    video_array_to_gif(video, str(path))
    back = gif_to_array(str(path))
    assert back.shape == video.shape
    # gif palette quantization is lossy; just sanity check the scale
    assert 0 <= back.min() and back.max() <= 1


def test_mp4_roundtrip(tmp_path):
    video = _synthetic_video(t=6, h=32, w=32)
    path = str(tmp_path / 'test.mp4')
    array_to_video(video, path)
    back = video_to_array(path)
    assert back.shape[0] == 6
    assert back.shape[-1] == 3


def test_cast_num_frames():
    v = _synthetic_video(t=5)
    assert cast_num_frames(v, frames=3).shape[0] == 3
    padded = cast_num_frames(v, frames=8)
    assert padded.shape[0] == 8
    np.testing.assert_allclose(padded[5:], 0)


def test_video_dataset_and_loader(tmp_path):
    for i in range(4):
        video_array_to_gif(_synthetic_video(seed=i), str(tmp_path / f'v{i}.gif'))

    ds = VideoDataset(tmp_path, image_size=16, num_frames=5)
    assert len(ds) == 4
    item = ds[0]
    assert item.shape == (5, 16, 16, 3)

    dl = DataLoader(ds, batch_size=2, shuffle=True, drop_last=True)
    batches = list(dl)
    assert len(batches) == 2
    (batch,) = batches[0]
    assert batch.shape == (2, 5, 16, 16, 3)


def test_image_dataset(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(0)
    for i in range(3):
        arr = (rng.uniform(size=(20, 28, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(tmp_path / f'img{i}.png')

    ds = ImageDataset(tmp_path, image_size=16)
    assert len(ds) == 3
    item = ds[0]
    assert item.shape == (16, 16, 3)
    assert 0 <= item.min() and item.max() <= 1


def test_random_split_deterministic(tmp_path):
    class FakeDS:
        def __len__(self):
            return 10

        def __getitem__(self, i):
            return i

    a1, b1 = random_split(FakeDS(), [8, 2], seed=42)
    a2, b2 = random_split(FakeDS(), [8, 2], seed=42)
    assert [a1[i] for i in range(8)] == [a2[i] for i in range(8)]
    assert len(b1) == 2


def test_uint8_dataset_native_collate_matches_float(tmp_path):
    """The trainer's product data path: uint8 decode -> native assemble_batch
    at collate must reproduce the float32 per-item path exactly."""
    for i in range(4):
        video_array_to_gif(_synthetic_video(seed=i), str(tmp_path / f'v{i}.gif'))

    ds_f32 = VideoDataset(tmp_path, image_size=16, num_frames=5)
    ds_u8 = VideoDataset(tmp_path, image_size=16, num_frames=5,
                         output_dtype='uint8')
    assert ds_u8[0].dtype == np.uint8

    dl_f32 = DataLoader(ds_f32, batch_size=2, shuffle=False, drop_last=True)
    dl_u8 = DataLoader(ds_u8, batch_size=2, shuffle=False, drop_last=True)
    (b_f32,), (b_u8,) = next(iter(dl_f32)), next(iter(dl_u8))
    assert b_u8.dtype == np.float32
    # uint8 resize rounds interpolated values to integers; bounded by 1/255
    np.testing.assert_allclose(b_u8, b_f32, atol=1.01 / 255)


def test_uint8_image_dataset_collate(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(0)
    for i in range(3):
        arr = rng.integers(0, 256, size=(24, 24, 3), dtype=np.uint8)
        Image.fromarray(arr).save(tmp_path / f'img{i}.png')

    ds = ImageDataset(tmp_path, image_size=16, random_hflip=False,
                      output_dtype='uint8')
    assert ds[0].dtype == np.uint8
    dl = DataLoader(ds, batch_size=3, shuffle=False, drop_last=True)
    (batch,) = next(iter(dl))
    assert batch.shape == (3, 16, 16, 3)
    assert batch.dtype == np.float32
    assert 0 <= batch.min() and batch.max() <= 1


def test_native_assembler_is_active():
    """The native .so must build and load in this image — the uint8 collate
    path above then genuinely exercises native code, not just the fallback."""
    from magvit2_pytorch_tpu.native import assemble_batch, native_available

    assert native_available()
    rng = np.random.default_rng(0)
    vids = [rng.integers(0, 256, size=(2, 4, 4, 3), dtype=np.uint8)
            for _ in range(3)]
    out = assemble_batch(vids)
    np.testing.assert_allclose(
        out, np.stack(vids).astype(np.float32) / 255.0, atol=1e-7)
