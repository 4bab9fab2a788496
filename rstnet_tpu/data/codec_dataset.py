"""Codec training dataset: wav file list -> fixed segments at 24k + 16k.

Capability parity with ``AudioCodec/MimiCodec/dataloaders/base_dataloader.py``
(WaveDataset:14): an scp file of wav paths; each item yields a random
``segment_size``-sample crop at the codec rate plus the matching 16 kHz view
for the SSL semantic teacher; short files are zero-padded; optional
amplitude normalization. Batches are stacked numpy arrays via a simple
shuffling iterator with background prefetch.
"""

from __future__ import annotations

import math
import random
import threading
import queue
from typing import Iterator, Optional

import numpy as np

from rstnet_tpu.utils.audio import read_wav, resample_linear


class WaveDataset:
    def __init__(
        self,
        flist_file: str,
        segment_size: int = 72000,
        sampling_rate: int = 24000,
        split: bool = True,
        shuffle: bool = False,
        audio_norm_scale: float = 1.0,
        seed: int = 0,
    ):
        with open(flist_file) as f:
            self.file_list = [l.strip() for l in f if l.strip()]
        if shuffle:
            random.Random(seed).shuffle(self.file_list)
        self.segment_size = segment_size
        self.sampling_rate = sampling_rate
        self.semantic_sample_rate = 16000
        self.split = split
        self.audio_norm_scale = audio_norm_scale
        self.segment_16k = int(segment_size / sampling_rate * self.semantic_sample_rate)
        self._rng = random.Random(seed + 1)

    def __len__(self) -> int:
        return len(self.file_list)

    def __getitem__(self, index: int) -> tuple[np.ndarray, np.ndarray]:
        wav, sr = read_wav(self.file_list[index])
        wav = wav[:1]  # mono
        if sr != self.sampling_rate:
            wav = resample_linear(wav, sr, self.sampling_rate)
        if self.audio_norm_scale < 1.0:
            wav = wav * self.audio_norm_scale
        audio = wav[0]
        if self.split:
            if audio.shape[0] >= self.segment_size:
                start = self._rng.randint(0, audio.shape[0] - self.segment_size)
                audio = audio[start : start + self.segment_size]
            else:
                audio = np.pad(audio, (0, self.segment_size - audio.shape[0]))
        audio_16k = resample_linear(audio[None], self.sampling_rate, 16000)[0]
        if self.split:
            if audio_16k.shape[0] >= self.segment_16k:
                audio_16k = audio_16k[: self.segment_16k]
            else:
                audio_16k = np.pad(audio_16k, (0, self.segment_16k - audio_16k.shape[0]))
        return audio[None].astype(np.float32), audio_16k[None].astype(np.float32)

    def load_batch(
        self, indices: list[int]
    ) -> tuple[np.ndarray, np.ndarray] | None:
        """Native fast path: load a whole batch of segments with the C++
        thread-pool loader (header probe -> windowed channel-0 read ->
        24k/16k resample, GIL released for the entire batch). Returns
        (batch24 [N, 1, S], batch16 [N, 1, S16]) — numerically identical to
        the per-item path — or None to fall back."""
        if not self.split:
            return None
        try:
            from rstnet_tpu import native

            if not native.available():
                return None
        except Exception:  # noqa: BLE001
            return None
        # Probe every header BEFORE consuming RNG draws, and restore the RNG
        # state on any fallback: the per-item path must then re-draw the same
        # crops (documented bit-equality between the two paths).
        paths, lens = [], []
        for i in indices:
            path = self.file_list[i]
            info = native.wav_info(path)
            if info is None:
                return None
            n, sr, _ = info
            # length after resample; llround (half away from zero) to match
            # the C++ loader's window computation exactly
            len_main = (
                n if sr == self.sampling_rate
                else int(math.floor(n * self.sampling_rate / sr + 0.5))
            )
            paths.append(path)
            lens.append(len_main)
        rng_state = self._rng.getstate()
        starts = [
            self._rng.randint(0, ln - self.segment_size)
            if ln >= self.segment_size else -1
            for ln in lens
        ]
        res = native.load_codec_batch(
            paths, starts, self.segment_size, self.segment_16k,
            self.sampling_rate, self.semantic_sample_rate,
        )
        if res is None:
            self._rng.setstate(rng_state)
            return None
        b24, b16, status = res
        if (status != 0).any():
            self._rng.setstate(rng_state)
            return None
        if self.audio_norm_scale < 1.0:
            b24 = b24 * self.audio_norm_scale
            b16 = b16 * self.audio_norm_scale
        return b24[:, None, :], b16[:, None, :]


class WaveIterator:
    """Shuffled batched iterator with a prefetch thread; each host consumes a
    disjoint shard (``rank::world_size``)."""

    def __init__(
        self,
        dataset: WaveDataset,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        rank: int = 0,
        world_size: int = 1,
        prefetch: int = 2,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.rank = rank
        self.world_size = world_size
        self.prefetch = prefetch
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def __len__(self) -> int:
        n = len(self.dataset) // self.world_size
        return max(1, n // self.batch_size)

    def _order(self) -> list[int]:
        idx = list(range(len(self.dataset)))
        if self.shuffle:
            random.Random(self.seed + self.epoch).shuffle(idx)
        return idx[self.rank :: self.world_size]

    def __iter__(self) -> Iterator[tuple[np.ndarray, np.ndarray]]:
        order = self._order()
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)

        def produce():
            try:
                batch24, batch16 = [], []
                pos = 0
                while pos < len(order):
                    idx = order[pos : pos + self.batch_size]
                    pos += len(idx)
                    fast = (
                        self.dataset.load_batch(idx)
                        if hasattr(self.dataset, "load_batch")
                        else None
                    )
                    if fast is not None:
                        items = list(zip(fast[0], fast[1]))
                    else:
                        items = []
                        for i in idx:
                            try:
                                items.append(self.dataset[i])
                            except Exception:  # noqa: BLE001 - skip bad utts
                                continue
                    for a24, a16 in items:
                        batch24.append(a24)
                        batch16.append(a16)
                        if len(batch24) == self.batch_size:
                            q.put((np.stack(batch24), np.stack(batch16)))
                            batch24, batch16 = [], []
            except BaseException as e:  # noqa: BLE001 - re-raised in the consumer
                # a loader failure must FAIL the epoch, not silently end it
                # (bad individual utterances are still skipped above)
                q.put(e)
            finally:
                q.put(None)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is None:
                break
            if isinstance(item, BaseException):
                raise item
            yield item
