"""Host-side batching loader with background prefetch.

Replaces the reference's torch DataLoader + ImageSizeBatchSampler stack
(ref lib/datasets/make_dataset.py:56-86, samplers.py:9-43, collate_batch.py)
with a thread-prefetched pipeline that emits *static-shape* numpy batches:

  * multi-scale training draws each batch's (h, w) from a small set of
    configured buckets instead of a continuous range — same augmentation
    diversity, bounded XLA recompiles (SURVEY.md §7 hard constraint).
  * each host feeds its own shard under multi-host SPMD — the loader is
    per-process by construction; `shard_batch` places the host-global batch
    onto the mesh.
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Iterator

import numpy as np

from clean_pvnet_tpu.config import Config
from clean_pvnet_tpu.registry import DATASETS


def collate(samples: list[dict[str, Any]]) -> dict[str, Any]:
    """Stack array fields; pass metadata through as lists
    (counterpart of ref collate_batch.py pvnet_collator)."""
    out: dict[str, Any] = {}
    for key in samples[0]:
        vals = [s[key] for s in samples]
        if isinstance(vals[0], np.ndarray):
            out[key] = np.stack(vals)
        elif isinstance(vals[0], (int, float, np.integer, np.floating)):
            out[key] = np.asarray(vals)
        else:
            out[key] = vals
    return out


class DataLoader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        buckets: tuple = ((480, 640),),
        seed: int = 0,
        num_workers: int = 2,
        drop_last: bool = True,
        process_index: int = 0,
        process_count: int = 1,
    ):
        """batch_size is the GLOBAL batch; under multi-host SPMD
        (process_count > 1) each host loads only its interleaved slice of
        every global batch — same seed on every host keeps the shuffle and
        the per-batch (h, w) bucket draw identical, so
        `DistributedSession.host_local_batch_to_global` can assemble the
        shards into one global array without host duplication."""
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.buckets = tuple(tuple(b) for b in buckets)
        self.rng = np.random.RandomState(seed)
        self.num_workers = max(num_workers, 1)
        self.drop_last = drop_last
        self.process_index = process_index
        self.process_count = process_count
        if process_count > 1 and batch_size % process_count != 0:
            raise ValueError(
                f"global batch_size {batch_size} must divide evenly over "
                f"{process_count} hosts"
            )

    def __len__(self) -> int:
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _index_batches(self) -> list[list[tuple[int, int, int]]]:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(idx)
        batches = []
        for i in range(0, len(idx) - (self.batch_size - 1 if self.drop_last else 0),
                       self.batch_size):
            chunk = idx[i : i + self.batch_size]
            if len(chunk) == 0:
                continue
            h, w = self.buckets[self.rng.randint(len(self.buckets))]
            if self.process_count > 1:
                chunk = chunk[self.process_index :: self.process_count]
            batches.append([(int(j), h, w) for j in chunk])
        return batches

    def __iter__(self) -> Iterator[dict[str, Any]]:
        batches = self._index_batches()
        if self.num_workers <= 1:
            for b in batches:
                yield collate([self.dataset[t] for t in b])
            return

        # order-preserving prefetch: workers push (batch_index, batch) and
        # the consumer releases them in index order. Determinism matters
        # beyond reproducibility — under multi-host SPMD every host must
        # emit logical batch k at step k or the assembled global batch
        # mixes different (h, w) buckets / different logical batches
        # across hosts.
        q: queue.Queue = queue.Queue(maxsize=self.num_workers * 2)
        stop = object()

        def worker(my_batches):
            try:
                for i, b in my_batches:
                    q.put((i, collate([self.dataset[t] for t in b])))
            finally:
                q.put(stop)

        indexed = list(enumerate(batches))
        shards = [indexed[i :: self.num_workers] for i in range(self.num_workers)]
        threads = [
            threading.Thread(target=worker, args=(s,), daemon=True) for s in shards
        ]
        for t in threads:
            t.start()
        done = 0
        pending: dict[int, dict[str, Any]] = {}
        next_idx = 0
        while done < len(threads) or pending:
            if next_idx in pending:
                yield pending.pop(next_idx)
                next_idx += 1
                continue
            if done == len(threads):
                # workers finished but a gap remains — nothing more will come
                break
            item = q.get()
            if item is stop:
                done += 1
                continue
            i, batch = item
            pending[i] = batch


def make_data_loader(cfg: Config, is_train: bool, ann_file: str,
                     seed: int | None = None) -> DataLoader:
    """Factory counterpart of reference make_data_loader
    (ref lib/datasets/make_dataset.py:60-86)."""
    name = cfg.train.dataset if is_train else cfg.test.dataset
    dataset = DATASETS.build(name, cfg, ann_file,
                             seed=cfg.train.seed if seed is None else seed)
    if is_train:
        import jax

        return DataLoader(
            dataset,
            cfg.train.batch_size,
            shuffle=True,
            buckets=cfg.train.image_buckets,
            seed=cfg.train.seed,
            num_workers=cfg.train.num_workers,
            drop_last=True,
            process_index=jax.process_index(),
            process_count=jax.process_count(),
        )
    return DataLoader(
        dataset,
        cfg.test.batch_size,
        shuffle=False,
        buckets=((480, 640),),
        seed=0,
        num_workers=cfg.train.num_workers,
        drop_last=False,
    )
