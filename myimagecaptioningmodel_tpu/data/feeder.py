"""Host->device input pipeline: background batch assembly + async device_put.

Replaces the reference's ``fluid.io.DataLoader.from_generator`` (a C++ async
feed queue, train.py:46, capacity 128) with a host-side prefetcher:

- a worker thread pulls sample lists from the reader, stacks them into
  padded numpy batches (images transposed CHW->NHWC for TPU), and pushes
  them onto a bounded queue (HDF5/gzip inflation releases the GIL, so a
  thread overlaps ingest with device compute);
- the consumer side optionally ``jax.device_put``s ahead of use so the next
  batch's H2D DMA overlaps the current step (double buffering into HBM).

Batches whose trailing remainder would produce a different shape can be
dropped (``drop_remainder``) to keep one compiled executable, or padded to
the full batch with a validity count.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, Optional, Tuple

import numpy as np

from myimagecaptioningmodel_tpu import native

_STOP = object()


class PrefetchingFeeder:
    """Iterate device-ready training batches ahead of consumption."""

    def __init__(
        self,
        reader: Callable[[], Iterator],
        capacity: int = 128,
        drop_remainder: bool = True,
        to_nhwc: bool = True,
        device_put: bool = True,
        sharding=None,
        image_norm: Optional[Tuple] = None,
        device_convert: bool = False,
        process_local: bool = False,
    ) -> None:
        self.reader = reader
        self.capacity = max(2, capacity)
        self.drop_remainder = drop_remainder
        self.to_nhwc = to_nhwc
        self.device_put = device_put
        self.sharding = sharding
        # (mean, std) for raw uint8 shard rows (storage_dtype="uint8");
        # ignored for float16/float32 rows, which are already normalized
        self.image_norm = image_norm
        # device_convert=True ships the raw storage batch (float16/uint8
        # NCHW) and lets the device fuse transpose/convert/normalize into
        # the first conv (models/captioner.prepare_images): the host does a
        # stack + DMA only, and H2D traffic drops 4x (f16) / 8x (uint8) vs
        # converted float32
        self.device_convert = device_convert
        # process_local=True (multi-host DP): each batch from the reader is
        # this PROCESS's shard of the global batch (reader process_shard);
        # assemble the global jax.Array from per-process local data without
        # any cross-host data movement (the global batch never exists on one
        # host). Requires `sharding` (the global batch NamedSharding).
        self.process_local = process_local

    @staticmethod
    def _batch_len(item) -> int:
        if isinstance(item, tuple):  # pre-stacked (imgs, caps) batch
            return item[0].shape[0]
        return len(item)

    def _assemble(self, samples) -> Optional[Tuple[np.ndarray, np.ndarray]]:
        if isinstance(samples, tuple):
            # pre-stacked (imgs [B,C,H,W], caps) from the parallel batch reader
            imgs, caps = samples
        else:
            imgs = np.stack([s[0] for s in samples])
            caps = np.stack([s[1] for s in samples])
        if self.device_convert:
            return imgs, caps  # raw storage batch; device converts (see ctor)
        if self.to_nhwc:
            if imgs.dtype == np.uint8:
                # fused normalize(+LUT)+transpose in native threads
                mean, std = self.image_norm or ((0.0,) * 3, (1.0,) * 3)
                imgs = native.convert_u8chw_to_f32nhwc(imgs, mean, std)
            else:
                # fused convert(+f16 decode)+transpose in native threads;
                # handles raw float16 shard rows and pre-cast float32
                imgs = native.convert_chw_to_nhwc_f32(imgs)
        elif imgs.dtype == np.uint8:
            # layout kept CHW, but raw pixels still need normalizing
            from myimagecaptioningmodel_tpu.data import image as image_mod

            mean, std = self.image_norm or ((0.0,) * 3, (1.0,) * 3)
            imgs = image_mod.normalize_uint8_chw(imgs, mean, std)
        elif imgs.dtype != np.float32:
            imgs = imgs.astype(np.float32)
        return imgs, caps

    def __iter__(self):
        q: "queue.Queue" = queue.Queue(maxsize=self.capacity)
        stop = threading.Event()
        batch_size: Optional[int] = None

        def blocking_put(item) -> bool:
            """q.put that stays responsive to shutdown: a consumer that
            breaks mid-epoch would otherwise leave the worker blocked on a
            full bounded queue forever (round-2 leak)."""
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def worker() -> None:
            nonlocal batch_size
            it = None
            try:
                it = self.reader()
                for samples in it:
                    if stop.is_set():
                        break
                    if batch_size is None:
                        batch_size = self._batch_len(samples)
                    if self.drop_remainder and self._batch_len(samples) != batch_size:
                        continue
                    if not blocking_put(self._assemble(samples)):
                        return
            except BaseException as e:  # surface worker errors to the consumer
                blocking_put(e)
                return
            finally:
                # run the reader generator's own cleanup (threaded readers
                # close their Hdf5 pools in a finally) deterministically,
                # not at GC
                close = getattr(it, "close", None)
                if close is not None:
                    close()
            blocking_put(_STOP)

        t = threading.Thread(target=worker, daemon=True, name="feeder")
        self._active = (t, stop, q)
        t.start()

        put = None
        if self.device_put:
            import jax

            if self.process_local:
                if self.sharding is None:
                    raise ValueError("process_local feed requires a sharding")
                nproc = jax.process_count()

                def put(b):
                    return tuple(
                        jax.make_array_from_process_local_data(
                            self.sharding, a, (a.shape[0] * nproc, *a.shape[1:])
                        )
                        for a in b
                    )

            elif self.sharding is not None:
                put = lambda b: jax.device_put(b, self.sharding)
            else:
                put = jax.device_put

        pending = None  # one batch in flight on the device (double buffer)
        try:
            while True:
                item = q.get()
                if item is _STOP:
                    break
                if isinstance(item, BaseException):
                    raise item
                if put is not None:
                    item = put(item)
                if pending is not None:
                    yield pending
                pending = item
            if pending is not None:
                yield pending
        finally:
            # normal exhaustion, consumer break (GeneratorExit), or error:
            # always release the worker and its reader resources
            self._shutdown(t, stop, q)

    @staticmethod
    def _shutdown(t: threading.Thread, stop: threading.Event, q: "queue.Queue") -> None:
        stop.set()
        while True:  # unblock a worker waiting on a full queue
            try:
                q.get_nowait()
            except queue.Empty:
                break
        t.join(timeout=10)

    def close(self) -> None:
        """Explicitly stop the most recent iteration's worker (idempotent;
        the iterator's own ``finally`` normally does this)."""
        active = getattr(self, "_active", None)
        if active is not None:
            self._shutdown(*active)
            self._active = None
