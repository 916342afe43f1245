"""Dataset + async prefetching loaders feeding the device.

Replaces the reference's MONAI Dataset / torch DataLoader with worker
processes (definer.py:514-525) by a thread-pool pipeline: NIfTI decode +
numpy augmentation run in background threads while the TPU executes the
previous step, and batches are handed to jax as ready-to-transfer numpy
arrays (the engine shards them onto the mesh with ``jax.device_put``).

Split logic mirrors definer.py:583-628 (sklearn KFold(5, shuffle, seed)).
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Callable, Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from .. import get_logger
from .discovery import (MODALITIES, MODALITIES_WITH_SEG, create_database,
                        create_database_test_docker, kfold_split,
                        make_file_records)
from .nifti import read_nifti
from .transforms import (augment_train_sample, compute_distance_map_fn,
                         preprocess_case)

logger = get_logger("data")


def load_case(record: Dict[str, Any]) -> Tuple[np.ndarray, Optional[np.ndarray], np.ndarray]:
    """Load 4 modality volumes + optional seg → ([X,Y,Z,4], [X,Y,Z]?, affine)."""
    vols = []
    affine = None
    for path in record["img"]:
        img = read_nifti(path)
        vols.append(np.asarray(img.data, np.float32))
        affine = img.affine if affine is None else affine
    img4 = np.stack(vols, axis=-1)
    seg = None
    if "seg" in record:
        seg = np.asarray(read_nifti(record["seg"]).data)
    return img4, seg, affine


class BraTSDataset:
    """Lazy per-case dataset: record → preprocessed sample dict."""

    def __init__(self, records: List[Dict[str, Any]], *,
                 with_seg: bool, remove_outliers: bool = False,
                 crop: bool = True, compute_distance_map: bool = False,
                 already_preprocess: bool = False,
                 normalize: Optional[bool] = None):
        self.records = records
        self.with_seg = with_seg
        self.remove_outliers = remove_outliers
        self.crop = crop and not already_preprocess
        self.already_preprocess = already_preprocess
        self.compute_distance_map = compute_distance_map
        # eval datasets normalize at load; train datasets load raw and the
        # loader normalizes after augmentation (reference transform order,
        # definer.py:458-468); already_preprocess never normalizes
        if normalize is None:
            normalize = not already_preprocess
        self.normalize = normalize and not already_preprocess

    def __len__(self) -> int:
        return len(self.records)

    def __getitem__(self, idx: int) -> Dict[str, Any]:
        record = self.records[idx]
        sample = self._getitem_native(record)
        if sample is None:
            sample = self._getitem_numpy(record)
        sample["patient_id"] = record["patient_id"]
        return sample

    def _getitem_numpy(self, record: Dict[str, Any]) -> Dict[str, Any]:
        img, seg, affine = load_case(record)
        if not self.with_seg:
            seg = None
        if self.already_preprocess:
            # skip crop+normalize (definer.py:476-479)
            sample = preprocess_case(img, seg, crop=False, normalize=False,
                                     compute_distance_map=self.compute_distance_map)
        else:
            sample = preprocess_case(img, seg, remove_outliers=self.remove_outliers,
                                     crop=self.crop,
                                     compute_distance_map=self.compute_distance_map,
                                     normalize=self.normalize)
        sample["affine"] = affine
        return sample

    def _getitem_native(self, record: Dict[str, Any]) -> Optional[Dict[str, Any]]:
        """C++ fast path (native/nifti_native.cc): threaded decode + crop +
        normalize in one call; seg stays on the numpy path (tiny uint8)."""
        from . import native
        if self.already_preprocess or not native.available():
            return None
        out = native.load_case_native(
            record["img"], crop=self.crop, normalize=self.normalize,
            remove_outliers=self.remove_outliers)
        if out is None:
            return None
        sample: Dict[str, Any] = {
            "img": out["img"],
            "foreground_start_coord": out["foreground_start_coord"],
            "foreground_end_coord": out["foreground_end_coord"],
            "original_shape": out["original_shape"],
            "affine": out["affine"],
        }
        if self.with_seg and "seg" in record:
            from .transforms import brats_labels_to_multichannel
            seg = np.asarray(read_nifti(record["seg"]).data)
            seg_mc = brats_labels_to_multichannel(seg)
            s = out["foreground_start_coord"]
            e = out["foreground_end_coord"]
            seg_mc = seg_mc[s[0]:e[0], s[1]:e[1], s[2]:e[2]]
            sample["seg"] = seg_mc
            if self.compute_distance_map:
                sample["distance_map"] = compute_distance_map_fn(seg_mc)
        return sample


def _collate(samples: List[Dict[str, Any]]) -> Dict[str, Any]:
    """Stack array fields into a batch (requires equal shapes, which the
    train pipeline guarantees via fixed patch size)."""
    batch: Dict[str, Any] = {}
    for key in samples[0]:
        vals = [s[key] for s in samples]
        if isinstance(vals[0], np.ndarray):
            batch[key] = np.stack(vals)
        else:
            batch[key] = vals
    return batch


class _PrefetchIterator:
    """Thread-pool map + bounded queue: keeps ``prefetch`` batches in flight.

    Abandon-safe: a consumer that stops iterating early (or is GC'd)
    releases the producer via ``close()`` — a plain blocking ``put`` on the
    bounded queue would otherwise pin the producer thread forever, and a
    long test session leaks threads until native thread creation aborts."""

    def __init__(self, make_item: Callable[[int], Any], n: int,
                 num_workers: int, prefetch: int = 2):
        self._q: "queue.Queue[Any]" = queue.Queue(maxsize=max(prefetch, 1))
        self._n = n
        self._error: Optional[BaseException] = None
        self._closed = threading.Event()

        def _put(item) -> bool:
            while not self._closed.is_set():
                try:
                    self._q.put(item, timeout=0.5)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                if num_workers <= 1:
                    for i in range(n):
                        if not _put(make_item(i)):
                            return
                else:
                    # bounded in-flight window: pool.map would schedule the
                    # whole epoch eagerly and materialize every batch in RAM
                    from collections import deque
                    from concurrent.futures import ThreadPoolExecutor
                    window = num_workers + max(prefetch, 1)
                    with ThreadPoolExecutor(num_workers) as pool:
                        futures = deque()
                        idx = 0
                        while idx < n or futures:
                            while idx < n and len(futures) < window:
                                futures.append(pool.submit(make_item, idx))
                                idx += 1
                            # q is bounded: this put blocks, throttling the
                            # submission loop above
                            if not _put(futures.popleft().result()):
                                return
            except BaseException as e:  # propagate into consumer
                self._error = e
            finally:
                _put(_SENTINEL)

        self._thread = threading.Thread(target=producer, daemon=True)
        self._thread.start()

    def close(self) -> None:
        """Release the producer thread (idempotent)."""
        self._closed.set()

    def __del__(self):  # abandoned iterator → no thread leak
        self.close()

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is _SENTINEL:
            self.close()
            if self._error is not None:
                raise self._error
            raise StopIteration
        return item


_SENTINEL = object()


class TrainLoader:
    """Shuffling, augmenting, batching loader with deterministic per-epoch
    seeds (replacing set_determinism, definer.py:507-508)."""

    def __init__(self, dataset: BraTSDataset, batch_size: int,
                 patch_size: Sequence[int], seed: int = 123,
                 num_workers: int = 4, drop_last: bool = False,
                 divisible_k: int = 8, compute_dm: bool = False,
                 remove_outliers: bool = False):
        # drop_last=False matches the reference DataLoader (definer.py:521)
        self.dataset = dataset
        self.batch_size = batch_size
        self.patch_size = list(patch_size)
        self.seed = seed
        self.num_workers = num_workers
        self.drop_last = drop_last
        self.divisible_k = divisible_k
        self.compute_dm = compute_dm
        self.remove_outliers = remove_outliers
        self.epoch = 0

    def __len__(self) -> int:
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        rng = np.random.default_rng((self.seed, self.epoch))
        order = rng.permutation(len(self.dataset))
        nb = len(self)
        batches = [order[i * self.batch_size:(i + 1) * self.batch_size]
                   for i in range(nb)]
        aug_seeds = rng.integers(0, 2 ** 31, size=len(self.dataset))

        def make_batch(bi: int) -> Dict[str, Any]:
            samples = []
            for idx in batches[bi]:
                s = self.dataset[int(idx)]
                s = augment_train_sample(
                    s, np.random.default_rng(int(aug_seeds[idx])),
                    self.patch_size, self.divisible_k,
                    compute_dm=self.compute_dm,
                    normalize=not self.dataset.normalize
                    and not self.dataset.already_preprocess,
                    remove_outliers=self.remove_outliers)
                samples.append(s)
            return _collate(samples)

        return iter(_PrefetchIterator(make_batch, nb, self.num_workers))


class EvalLoader:
    """Batch-size-1 loader for val/test (reference val loader, definer.py:524)."""

    def __init__(self, dataset: BraTSDataset, num_workers: int = 2):
        self.dataset = dataset
        self.num_workers = num_workers

    def __len__(self) -> int:
        return len(self.dataset)

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        def make_item(i: int) -> Dict[str, Any]:
            return _collate([self.dataset[i]])

        return iter(_PrefetchIterator(make_item, len(self.dataset),
                                      self.num_workers))


# ---------------------------------------------------------------------------
# Factory entry points mirroring definer.py
# ---------------------------------------------------------------------------


def create_train_val_records(cfg: Any) -> Tuple[List[Dict], List[Dict]]:
    """definer.py:583-628: KFold(5, shuffle, seed) over the sorted patient
    list, or an explicit val_data_path."""
    if cfg.val_data_path is not None and cfg.fold is not None:
        raise ValueError("Specified a val_data_path when a fold split is "
                         "specified is not possible")
    train_files: List[Dict] = []
    val_files: List[Dict] = []
    if cfg.val_data_path:
        db = create_database(cfg.val_data_path,
                             required_modality=MODALITIES_WITH_SEG)
        val_files = make_file_records(db, with_seg=True)
    if cfg.train_data_path:
        db = create_database(cfg.train_data_path,
                             required_modality=MODALITIES_WITH_SEG)
        ids = list(db)
        train_id, val_id = (ids, []) if (cfg.fold is None or cfg.val_data_path) \
            else kfold_split(ids, cfg.fold, 5, cfg.seed)
        recs = make_file_records(db, with_seg=True)
        train_files = [r for r in recs if r["patient_id"] in set(train_id)]
        if not cfg.val_data_path:
            val_files = [r for r in recs if r["patient_id"] in set(val_id)]
    if not train_files and not val_files:
        raise ValueError("train files and val files are empty")
    return train_files, val_files


def make_train_val_loaders(cfg: Any, train_in_val_mode: bool = False
                           ) -> Tuple[Optional[TrainLoader], Optional[EvalLoader]]:
    """definer.py:438-527 equivalent."""
    train_files, val_files = create_train_val_records(cfg)
    from ..parallel.multihost import (process_count, process_shard,
                                      shard_eval_records)
    if process_count() > 1:
        # multi-host: each process loads only its stripe of the train set
        # (equal lengths -> lock-step steps); cfg.batch_size is per-process.
        # Eval cases are striped untrimmed — each process scores its stripe
        # locally and the meters are merged globally (multihost.merge_meters).
        # In train_in_val_mode the train set IS the eval set, so it must be
        # striped untrimmed too (every case scored exactly once).
        if train_in_val_mode:
            train_files = shard_eval_records(train_files)
        else:
            train_files = process_shard(train_files)
            # lock-step steps need FULL batches everywhere: pad the stripe
            # (by cycling it) to a batch_size multiple, else the final
            # partial batch breaks global-batch divisibility on the mesh
            bs = max(int(getattr(cfg, "batch_size", 1)), 1)
            if train_files and len(train_files) % bs:
                pad = bs - len(train_files) % bs
                train_files = train_files + [
                    train_files[i % len(train_files)] for i in range(pad)]
        val_files = shard_eval_records(val_files)
    needs_dm = "boundary" in cfg.criterion
    train_loader = None
    if train_files and not train_in_val_mode:
        train_ds = BraTSDataset(train_files, with_seg=True,
                                remove_outliers=cfg.remove_outliers,
                                already_preprocess=cfg.already_preprocess,
                                normalize=False)
        train_loader = TrainLoader(train_ds, cfg.batch_size, cfg.patch_size,
                                   seed=cfg.seed, num_workers=cfg.num_workers,
                                   compute_dm=needs_dm,
                                   remove_outliers=cfg.remove_outliers)
    eval_files = train_files if train_in_val_mode else val_files
    val_loader = None
    if eval_files:
        val_ds = BraTSDataset(eval_files, with_seg=True,
                              remove_outliers=cfg.remove_outliers,
                              compute_distance_map=needs_dm,
                              already_preprocess=cfg.already_preprocess)
        val_loader = EvalLoader(val_ds, num_workers=max(cfg.num_workers // 2, 1))
    return train_loader, val_loader


def discover_test_records(cfg: Any) -> list:
    """Complete (all-modality) test cases on disk right now — the
    discovery half of make_test_loader, reusable by watch mode."""
    if getattr(cfg, "docker_test", False):
        db = create_database_test_docker(cfg.test_data_path,
                                         required_modality=MODALITIES)
    else:
        db = create_database(cfg.test_data_path, required_modality=MODALITIES)
    return make_file_records(db, with_seg=False)


def make_records_loader(records: Sequence[Any], cfg: Any
                        ) -> Optional["EvalLoader"]:
    """EvalLoader over explicit no-seg records (watch mode batches)."""
    if not records:
        return None
    ds = BraTSDataset(list(records), with_seg=False, remove_outliers=False)
    return EvalLoader(ds, num_workers=max(getattr(cfg, "num_workers", 2) // 2,
                                          1))


def make_test_loader(cfg: Any) -> Optional[EvalLoader]:
    """definer.py:554-580: no seg, crop + plain z-score normalize."""
    records = discover_test_records(cfg)
    if not records:
        return None
    from ..parallel.multihost import process_count, shard_eval_records
    if process_count() > 1:
        # multi-host inference: each process decodes + scores its stripe
        # (possibly empty — the loader then just yields nothing and the
        # process joins the final merge collectives with zero rows)
        records = shard_eval_records(records)
    return make_records_loader(records, cfg)
