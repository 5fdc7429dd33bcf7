"""Asynchronous frame prefetching: producer thread + bounded buffer.

Counterpart of the reference's ``utils/dataset_loader_thread.{h,cc}`` +
``utils/bounded_buffer.h`` (producer prefetches frames into a mutex/condvar
circular buffer; timed pop; None sentinel on end-of-data, bounded_buffer.h:77-130,
dataset_loader_thread.cc:30-50).

A C++ ring-buffer backend (native/) can be slotted in for zero-GIL IO; the
Python queue version is the portable default — the heavy work (imdecode,
stereo) releases the GIL inside OpenCV anyway.
"""
from __future__ import annotations

import queue
import threading
from typing import Optional

from bpvo_tpu.data.dataset import Dataset, DatasetFrame


class DatasetLoaderThread:
    """Iterate frames of ``dataset`` with readahead.

    Usage:
        loader = DatasetLoaderThread(dataset, buffer_size=16)
        while (frame := loader.pop(timeout=5.0)) is not None: ...
    """

    def __init__(self, dataset: Dataset, buffer_size: int = 16,
                 start_frame: int = 0, max_frames: Optional[int] = None,
                 device_prefetch: bool = False):
        self._dataset = dataset
        self._buffer: "queue.Queue" = queue.Queue(maxsize=buffer_size)
        self._stop = threading.Event()
        self._start_frame = start_frame
        self._max_frames = max_frames
        self._device_prefetch = device_prefetch
        self._thread = threading.Thread(target=self._producer, daemon=True)
        self._thread.start()

    def _producer(self):
        i = self._start_frame
        n = 0
        while not self._stop.is_set():
            if self._max_frames is not None and n >= self._max_frames:
                break
            try:
                frame = self._dataset.get_frame(i)
            except Exception:
                frame = None
            if frame is not None and self._device_prefetch:
                # overlap the host->device copy with compute: the consumer
                # receives device arrays ready to use (the loader thread is
                # otherwise idle while the accelerator works)
                import jax.numpy as jnp
                frame.image = jnp.asarray(frame.image, jnp.float32)
                frame.disparity = jnp.asarray(frame.disparity, jnp.float32)
            # sentinel on end/error (dataset_loader_thread.cc:43-47)
            self._put(frame)
            if frame is None:
                return
            i += 1
            n += 1
        self._put(None)

    def _put(self, item):
        while not self._stop.is_set():
            try:
                self._buffer.put(item, timeout=0.1)
                return
            except queue.Full:
                continue

    def pop(self, timeout: float = 5.0) -> Optional[DatasetFrame]:
        """Blocking pop with timeout; None signals end-of-sequence."""
        try:
            return self._buffer.get(timeout=timeout)
        except queue.Empty:
            return None

    def stop(self):
        self._stop.set()

    def is_running(self) -> bool:
        return self._thread.is_alive()

    def __iter__(self):
        while True:
            f = self.pop()
            if f is None:
                return
            yield f

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.stop()
