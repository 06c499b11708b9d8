"""Host data loader: seeded shuffling, threaded decode, prefetch.

Replaces torch DataLoader (reference main.py:124-129). Differences by
design:

  * deterministic per-sample RNG — sample i of epoch e is reproducible
    from (seed, e, i) regardless of worker count (the reference's
    get_seeded_generator ignores its seed, utils/misc.py:139-142);
  * threads instead of worker processes: PIL decode and numpy release
    the GIL, and samples are numpy arrays ready for device_put;
  * drop_last defaults to True for train loaders — static batch shapes
    mean one XLA compile, the torch default's ragged tail batch would
    recompile every epoch.
"""

from __future__ import annotations

import multiprocessing as mp
import random
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Optional

import numpy as np

# fork-inherited dataset for process workers (PIL + numpy augmentation is
# GIL-bound: threads top out well below TPU step throughput)
_WORKER_DATASET = None


def _process_fetch(args):
    seed_key, index = args
    rng = random.Random(seed_key)
    return _WORKER_DATASET.__getitem__(index, rng=rng)


class DataLoader:
    def __init__(self, dataset, batch_size: int = 1, shuffle: bool = False,
                 num_workers: int = 0, drop_last: Optional[bool] = None,
                 seed: int = 0, collate=None, prefetch: int = 2,
                 worker_mode: str = "thread",
                 pin_memory: bool = False,  # pin_memory: YAML compat no-op
                 sampler=None):
        # sampler: a parallel.multihost.DistributedSampler — this host
        # iterates only its own disjoint slice of every (shuffled) epoch.
        # batch_size is PER-HOST (torch per-process convention); the
        # sampler must agree or __len__ and the batch slicing diverge.
        if sampler is not None and sampler.batch_size != batch_size:
            raise ValueError(
                f"sampler.batch_size={sampler.batch_size} != loader "
                f"batch_size={batch_size}; they must match")
        self.sampler = sampler
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = num_workers
        self.drop_last = shuffle if drop_last is None else drop_last
        self.seed = seed
        self.collate = collate if collate is not None else type(dataset).collate
        self.prefetch = prefetch
        self.worker_mode = worker_mode
        self.epoch = 0
        self._pool = None

    def __len__(self):
        if self.sampler is not None:
            return len(self.sampler)
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def _indices(self):
        if self.sampler is not None:
            # already wrap-padded to a whole number of per-host batches
            return self.sampler.epoch_indices(self.epoch)
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            rs = np.random.RandomState((self.seed * 1_000_003 + self.epoch) % (2**31))
            rs.shuffle(idx)
        return idx

    # NOTE: on a single-core host (this container) 'thread' outperforms
    # 'process' (fork+pickle overhead with no parallelism to gain);
    # many-core TPU hosts should use 'process'. For full host-offload use
    # the device_aug path (RawCropDataset + data/device_pipeline.py).
    def _seed_key(self, index: int) -> str:
        return f"{self.seed}:{self.epoch}:{int(index)}"

    def _fetch(self, index: int):
        rng = random.Random(self._seed_key(index))
        return self.dataset.__getitem__(int(index), rng=rng)

    def _get_pool(self):
        if self._pool is None:
            global _WORKER_DATASET
            _WORKER_DATASET = self.dataset
            ctx = mp.get_context("fork")
            self._pool = ctx.Pool(self.num_workers)
        return self._pool

    def close(self):
        if self._pool is not None:
            self._pool.terminate()
            self._pool = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    def __iter__(self) -> Iterator:
        idx = self._indices()
        n_batches = len(self)
        batches = [idx[b * self.batch_size : (b + 1) * self.batch_size]
                   for b in range(n_batches)]

        if self.num_workers <= 0:
            for b in batches:
                samples = [self._fetch(i) for i in b]
                yield self._assemble(samples)
            return

        if self.worker_mode == "process":
            pool = self._get_pool()
            args = [(self._seed_key(i), int(i)) for b in batches for i in b]
            it = pool.imap(_process_fetch, args,
                           chunksize=max(1, self.batch_size // 2))
            for b in batches:
                yield self._assemble([next(it) for _ in range(len(b))])
            return

        with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            # keep `prefetch` batches in flight
            pending = []
            bi = 0
            while bi < len(batches) or pending:
                while bi < len(batches) and len(pending) <= self.prefetch:
                    pending.append([pool.submit(self._fetch, i) for i in batches[bi]])
                    bi += 1
                futs = pending.pop(0)
                yield self._assemble([f.result() for f in futs])

    def _assemble(self, samples):
        if self.batch_size == 1 and ("name" in samples[0]):
            return samples[0]  # val/test: one raw sample dict
        return self.collate(samples)


def build_loader(dataset, spec: dict, seed: int = 0, collate=None) -> DataLoader:
    """spec is the reference's {train,val,test}_loader YAML block.

    On a multi-process pod run, shuffled (training) loaders get a
    DistributedSampler automatically: each host iterates its own
    disjoint slice of the epoch, and the trainer assembles the global
    batch from the per-host loads via multihost.host_shard_batch.
    ``batch_size`` is PER-HOST (torch's per-process DataLoader
    convention): the global batch is process_count x batch_size. Eval
    loaders stay whole-dataset on every host — the reference's metric
    protocol evaluates the full split.
    """
    sampler = None
    if spec.get("shuffle", False):
        import jax

        if jax.process_count() > 1:
            from dgvcc_tpu.parallel.multihost import DistributedSampler

            sampler = DistributedSampler(
                len(dataset), spec.get("batch_size", 1), seed=seed)
    return DataLoader(
        dataset,
        batch_size=spec.get("batch_size", 1),
        shuffle=spec.get("shuffle", False),
        num_workers=spec.get("num_workers", 0),
        drop_last=spec.get("drop_last"),
        seed=seed,
        collate=collate,
        prefetch=spec.get("prefetch", 2),
        worker_mode=spec.get("worker_mode", "thread"),
        pin_memory=spec.get("pin_memory", False),
        sampler=sampler,
    )
