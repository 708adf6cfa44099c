"""Training data pipeline: on-the-fly degradation on host workers.

The reference degrades each clip inside dataloader workers — random target
rate in {4k..32k step 1k}, random Chebyshev-I order 1-11 / ripple from a
fixed set (train) or order 8 / ripple 0.05 (valid), sosfiltfilt, down+up
resample_poly, length-matched (reference: src/flowhigh/train/data.py:92-131).
Filter design is data-dependent per clip, so this stays host-side (like the
reference's 8 numpy workers); batches prefetch to device asynchronously.

WAV IO uses scipy (librosa/torchaudio are not available in this image); a
synthetic dataset generates harmonic clips for tests and data-free benches.
"""

from __future__ import annotations

import queue
import threading
from pathlib import Path
from typing import Iterator, Optional

import numpy as np
import scipy.io.wavfile as wavfile

from ..config import DataConfig
from ..dsp.filters import host_degrade

RIPPLES = (1e-9, 1e-6, 1e-3, 1, 5)  # (reference: data.py:109)


def load_wav_mono(path, keep_int16: bool = False) -> tuple[np.ndarray, int]:
    """Read a wav as mono float32 in [-1, 1] (reference: meldataset.py:25-30,
    which divides int16 by MAX_WAV_VALUE). With ``keep_int16=True``, a mono
    16-bit file is returned as raw int16 instead: ``ServingPipeline.submit``
    and ``FlowHighSR.generate`` upload such input as-is (half the
    host->device bytes on tunneled deployments) and cast+scale on device —
    bit-identical, since int16 is exact in float32 and /32768 is a power of
    two. Stereo int16 still converts (the channel mean is not int16)."""
    sr, data = wavfile.read(path)
    if data.dtype == np.int16:
        if keep_int16 and data.ndim == 1:
            return data, sr
        wave = data.astype(np.float32) / 32768.0
    elif data.dtype == np.int32:
        wave = data.astype(np.float32) / 2147483648.0
    elif data.dtype == np.uint8:
        wave = (data.astype(np.float32) - 128.0) / 128.0
    else:
        wave = data.astype(np.float32)
    if wave.ndim == 2:
        wave = wave.mean(axis=1)
    return wave, sr


class AudioDataset:
    """Glob **/*.wav + per-item degradation (reference: data.py:23-131)."""

    def __init__(self, folder, cfg: DataConfig = DataConfig(), mode: Optional[str] = None,
                 audio_extension: str = ".wav"):
        path = Path(folder)
        assert path.exists(), "folder does not exist"
        self.files = sorted(path.glob(f"**/*{audio_extension}"))
        assert len(self.files) > 0, "no files found"
        self.cfg = cfg
        self.mode = mode

    def __len__(self):
        return len(self.files)

    def __getitem__(self, idx: int):
        rng = np.random.default_rng()
        wave, sr = load_wav_mono(self.files[idx])
        return degrade_item(wave, sr, self.cfg, self.mode, rng)


def degrade_item(wave: np.ndarray, sr: int, cfg: DataConfig, mode: Optional[str],
                 rng: np.random.Generator) -> dict:
    wave = wave / (np.abs(wave).max() + 1e-12)
    rates = np.arange(cfg.downsample_min, cfg.downsample_max + cfg.downsample_step,
                      cfg.downsample_step)
    random_sr = int(rng.choice(rates))
    if mode == "valid":
        order, ripple = 8, 0.05
    else:
        order = int(rng.integers(1, 12))
        ripple = float(rng.choice(RIPPLES))
    cond = host_degrade(wave.astype(np.float64), sr, random_sr, order, ripple)
    return {
        "wave": wave.astype(np.float32),
        "length": len(wave),
        "cond": cond.astype(np.float32),
        "random_sr": random_sr,
    }


class SyntheticAudioDataset:
    """Data-free stand-in: random harmonic complexes at 48 kHz. Same item
    schema as AudioDataset, for tests/benches without a corpus."""

    def __init__(self, cfg: DataConfig = DataConfig(), n_items: int = 64,
                 seconds: float = 3.0, seed: int = 0, mode: Optional[str] = None):
        self.cfg = cfg
        self.n_items = n_items
        self.seconds = seconds
        self.seed = seed
        self.mode = mode

    def __len__(self):
        return self.n_items

    def __getitem__(self, idx: int):
        rng = np.random.default_rng(self.seed * 100003 + idx)
        sr = self.cfg.sampling_rate
        n = int(sr * self.seconds)
        t = np.arange(n) / sr
        f0 = rng.uniform(80, 300)
        wave = np.zeros(n)
        for k in range(1, 12):
            if f0 * k < sr / 2:
                wave += rng.uniform(0.2, 1.0) / k * np.sin(
                    2 * np.pi * f0 * k * t + rng.uniform(0, 2 * np.pi))
        wave += 0.01 * rng.standard_normal(n)
        return degrade_item(wave.astype(np.float32), sr, self.cfg, self.mode, rng)


def collate(items: list[dict], pad_to_longest: bool = True) -> dict:
    """Pad-to-longest collate (reference: data.py:136-167)."""
    if pad_to_longest:
        t = max(it["length"] for it in items)
    else:
        t = min(it["length"] for it in items)
    b = len(items)
    wave = np.zeros((b, t), np.float32)
    cond = np.zeros((b, t), np.float32)
    for i, it in enumerate(items):
        n = min(it["length"], t)
        wave[i, :n] = it["wave"][:n]
        cond[i, :n] = it["cond"][:n]
    return {
        "wave": wave,
        "cond": cond,
        "lengths": np.array([min(it["length"], t) for it in items], np.int32),
        "random_sr": np.array([it["random_sr"] for it in items], np.int32),
    }


_POOL_DS = None  # per-worker-process dataset (set once by _pool_init)


def _pool_init(ds):
    global _POOL_DS
    _POOL_DS = ds


def _pool_item(i: int) -> dict:
    return _POOL_DS[i]


def batch_iterator(
    ds, batch_size: int, seed: int = 0, pad_to: Optional[int] = None,
    num_workers: int = 2, prefetch: int = 4, device_prefetch: bool = False,
    process_index: int = 0, process_count: int = 1,
    worker_type: str = "thread",
) -> Iterator[dict]:
    """Infinite shuffled batches with threaded host-side prefetch.

    ``pad_to``: optionally pad/crop every batch to a fixed sample count so the
    jitted train step sees ONE static shape (no recompiles, the TPU idiom).

    ``device_prefetch``: additionally ``jax.device_put`` each batch from the
    prefetch threads, so the host->device copy overlaps the previous train
    step instead of serializing inside it — on a tunneled TPU the synchronous
    upload of a batch-32 3 s batch (74 MB) otherwise dominates the step.

    ``process_index``/``process_count``: multi-host data sharding (the
    reference's DistributedSampler analog, via Accelerate's prepared
    dataloader). ``batch_size`` is the GLOBAL batch; every process draws the
    SAME global index sample (shared seed) and keeps only its own
    ``batch_size/process_count`` rows — disjoint, statically-shaped local
    shards that ``parallel.shard_global_batch`` reassembles into one global
    array. Pass ``jax.process_index()/process_count()`` after
    ``parallel.initialize()``.

    ``worker_type``: ``"thread"`` (default) or ``"process"``. The
    degradation is scipy C code that mostly releases the GIL, so threads
    scale to ~480 clips/s on this host (scripts/bench_data.py) — just short
    of the 528 clips/s device rate at batch 32. ``"process"`` farms item
    degradation to a spawn-context worker pool (the reference's 8 dataloader
    processes, reference data.py:169-171); the dataset must be picklable
    (AudioDataset/SyntheticAudioDataset are).
    """
    assert batch_size % max(process_count, 1) == 0, (
        f"global batch {batch_size} must divide over {process_count} processes")
    rows = slice((batch_size // process_count) * process_index,
                 (batch_size // process_count) * (process_index + 1))

    pool = None
    if worker_type == "process":
        import multiprocessing as mp
        from concurrent.futures import ProcessPoolExecutor
        pool = ProcessPoolExecutor(
            max_workers=max(1, num_workers),
            mp_context=mp.get_context("spawn"),
            initializer=_pool_init, initargs=(ds,))
        n_threads = 2  # coordinators: draw indices, collate, device_put
    elif worker_type == "thread":
        n_threads = max(1, num_workers)
    else:
        raise ValueError(f"worker_type must be 'thread' or 'process', "
                         f"got {worker_type!r}")

    def make_batch(rng: np.random.Generator) -> dict:
        # the full global draw, identical on every process (same seed), so
        # the per-process row slices are disjoint by construction
        idx = rng.choice(len(ds), size=batch_size, replace=len(ds) < batch_size)
        local = [int(i) for i in idx[rows]]
        if pool is not None:
            items = list(pool.map(_pool_item, local,
                                  chunksize=max(1, len(local) // (
                                      2 * max(1, num_workers)))))
        else:
            items = [ds[i] for i in local]
        if pad_to is not None:
            for it in items:
                n = len(it["wave"])
                if n >= pad_to:
                    it["wave"] = it["wave"][:pad_to]
                    it["cond"] = it["cond"][:pad_to]
                    it["length"] = pad_to
                else:
                    it["wave"] = np.pad(it["wave"], (0, pad_to - n))
                    it["cond"] = np.pad(it["cond"], (0, pad_to - n))
        batch = collate(items)
        if device_prefetch:
            import jax
            batch = jax.device_put(batch)  # async: overlaps the running step
        return batch

    q: queue.Queue = queue.Queue(maxsize=prefetch)
    stop = threading.Event()

    def worker(wid: int):
        rng = np.random.default_rng(seed * 7919 + wid)  # per-thread generator
        while not stop.is_set():
            try:
                batch = make_batch(rng)
            except Exception as e:  # surface in the consumer, don't hang it
                batch = e
            while not stop.is_set():
                try:
                    q.put(batch, timeout=1.0)
                    break
                except queue.Full:
                    continue
            if isinstance(batch, Exception):
                return

    threads = [threading.Thread(target=worker, args=(i,), daemon=True)
               for i in range(n_threads)]
    for th in threads:
        th.start()
    try:
        while True:
            item = q.get()
            if isinstance(item, Exception):
                raise item
            yield item
    finally:
        stop.set()
        if pool is not None:
            pool.shutdown(wait=False, cancel_futures=True)


class Subset:
    """Index-remapped view of a dataset (torch.utils.data.Subset analog)."""

    def __init__(self, dataset, indices):
        self.dataset = dataset
        self.indices = list(indices)

    def __len__(self):
        return len(self.indices)

    def __getitem__(self, idx: int):
        return self.dataset[self.indices[idx]]


def random_split(dataset, valid_frac: float, seed: int = 53):
    """Seeded train/valid split (reference: trainer.py:118-129 —
    ``random_split(ds, [train, valid], generator=manual_seed(53))``).
    Returns (train_subset, valid_subset); deterministic for a given seed,
    but NOT item-identical to torch's ``generator(53)`` split (numpy's
    permutation consumes randomness differently) — don't expect matching
    train/valid membership when comparing runs against the reference."""
    n = len(dataset)
    train_size = int((1 - valid_frac) * n)
    perm = np.random.default_rng(seed).permutation(n)
    return (Subset(dataset, perm[:train_size]),
            Subset(dataset, perm[train_size:]))


class VocoderSegmentDataset:
    """Random fixed-length 48 kHz segments for vocoder GAN training
    (reference: src/flowhigh/models/bigvgan/meldataset.py:99-202 — the mel
    pair is computed on device by VocoderTrainer, not here)."""

    def __init__(self, source, segment_samples: int = 15360, seed: int = 0):
        """``source``: an AudioDataset/SyntheticAudioDataset-like object whose
        items have a 48 kHz 'wave' field."""
        self.source = source
        self.segment_samples = segment_samples
        self.seed = seed

    def __len__(self):
        return len(self.source)

    def __getitem__(self, idx: int) -> dict:
        rng = np.random.default_rng(self.seed * 99991 + idx)
        wave = self.source[idx]["wave"]
        n = self.segment_samples
        if len(wave) >= n:
            start = int(rng.integers(0, len(wave) - n + 1))
            seg = wave[start : start + n]
        else:
            seg = np.pad(wave, (0, n - len(wave)))
        return {"wave": seg.astype(np.float32), "length": n,
                "cond": seg.astype(np.float32), "random_sr": 48000}


def scan_checkpoints(folder, prefix: str = "FLowHigh."):
    """Latest torch-layout checkpoint in a results folder
    (reference: src/flowhigh/models/bigvgan/utils.py:57-76)."""
    from pathlib import Path
    cands = sorted(Path(folder).glob(f"{prefix}*.pt"),
                   key=lambda p: int("".join(filter(str.isdigit, p.stem)) or 0))
    return cands[-1] if cands else None
