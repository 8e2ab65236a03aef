"""Batch pipelines: the three-stream trainer feed and the eval loader.

Replaces the reference's zip-of-three-DataLoaders with recycled iterators
and silent ragged-batch skips (/root/reference/src/main_baseline.py:194-226)
with a deterministic, static-shape batcher:

  * epoch length = number of full SYN batches (the reference's driver
    stream),
  * the weak and unlabeled streams re-cycle modularly with per-epoch
    reshuffling — no partial batches, no skips,
  * per-host sharding for multi-process running: each host takes its
    jax.process_index-strided slice of every stream.

Batches are dicts of stacked numpy arrays ready for the jitted step:
  syn (Bs,T,F) • syn_strong (Bs,Tf,C) • real (Br,T,F) — first half weak,
  second half unlabeled-PL • real_weak (Br,C).
"""
from __future__ import annotations

from typing import Any, Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np


def _epoch_order(n: int, rng: np.random.Generator, shuffle: bool) -> np.ndarray:
    idx = np.arange(n)
    return rng.permutation(idx) if shuffle else idx


def _cat(a, b):
    """Concatenate on whichever library owns the arrays — np.concatenate on
    device-resident jax arrays would silently round-trip through host."""
    if isinstance(a, np.ndarray):
        return np.concatenate([a, b])
    import jax.numpy as jnp
    return jnp.concatenate([a, b])


def _real_stream_batch(wf, wt, uf, ut, wi, ui, wt_rank: int, ut_rank: int):
    """Gather + weak-reduce + concat for the two real streams (weak-labeled
    + unlabeled/pseudo-labeled): the shared body of ``_assemble_batch`` and
    ``_assemble_real`` (pure function, traced under jit on the device
    path). The weak stream may carry strong (T, C) targets — they are
    max-reduced to weak here and passed through as ``real_strong`` when
    BOTH streams have them."""
    out = {"real": _cat(wf[wi], uf[ui])}
    w_weak = wt[wi]
    u_weak = ut[ui]
    w_red = w_weak.max(axis=1) if wt_rank == 3 else w_weak
    u_red = u_weak.max(axis=1) if ut_rank == 3 else u_weak
    out["real_weak"] = _cat(w_red, u_red)
    if wt_rank == 3 and ut_rank == 3:
        out["real_strong"] = _cat(w_weak, u_weak)
    return out


def gather_batch(arrays: Dict[str, Any], ids: Dict[str, Any]
                 ) -> Dict[str, Any]:
    """Assemble one training batch from device-resident dataset arrays by
    index — the pure-function core of ``_assemble_batch``, traceable inside
    ``lax.scan`` (steps.make_epoch_runner). ``arrays`` holds the contiguous
    (features, targets) pairs per stream; ``ids`` the per-batch index
    vectors."""
    out = {"syn": arrays["syn_f"][ids["syn"]],
           "syn_strong": arrays["syn_t"][ids["syn"]]}
    if "weak_f" in arrays:
        out.update(_real_stream_batch(
            arrays["weak_f"], arrays["weak_t"],
            arrays["unlab_f"], arrays["unlab_t"],
            ids["weak"], ids["unlab"],
            arrays["weak_t"].ndim, arrays["unlab_t"].ndim))
    return out


class ThreeStreamLoader:
    def __init__(self, syn_dataset, weak_dataset=None, unlabeled_dataset=None,
                 batch_size: int = 12, seed: int = 2023, shuffle: bool = True,
                 process_index: int = 0, process_count: int = 1,
                 device_resident: Optional[bool] = None,
                 layout: str = "default"):
        # layout="origin": the main.py lineage's COMBINED real batch —
        # ¼ weak + ½ unlabeled-PL + ¼ strong rows (the strong rows drawn
        # from the SYN dataset: in the reference's DESED-style combined
        # loader the strong-masked rows ARE the synthetic clips,
        # main.py:729-741) with a separate full-size syn stream whose
        # forward runs but whose predictions are unused (main.py:344-346).
        # The batch then carries real (B), real_weak (B, C) and
        # real_strong (B, Tf, C); weak-only target rows are broadcast over
        # frames (their strong targets are never read by the step's masked
        # losses). batch_size must be divisible by 4.
        if layout not in ("default", "origin"):
            raise ValueError(layout)
        if layout == "origin" and batch_size % 4:
            raise ValueError("layout='origin' needs batch_size % 4 == 0 "
                             "(¼ weak + ½ unlabeled + ¼ strong rows)")
        self.layout = layout
        self.syn = syn_dataset
        self.weak = weak_dataset
        self.unlab = unlabeled_dataset
        self.batch_size = batch_size
        self.half = batch_size // 2
        self.seed = seed
        self.shuffle = shuffle
        self.process_index = process_index
        self.process_count = process_count
        # device-resident datasets: hold the contiguous dataset arrays in
        # HBM once and assemble batches by ON-DEVICE gather — batch
        # assembly drops from host-memcpy speed (~4 ms) to a dispatched
        # gather (~µs), which matters against a ~1 ms jitted step. None =
        # auto: on when an accelerator is the default backend and the
        # arrays fit comfortably (the full reference dataset is ~2-3 GB vs
        # 16 GB HBM).
        self.device_resident = device_resident
        self._dev_arrays: Dict[int, tuple] = {}

    def __len__(self):
        return len(self._host_indices(len(self.syn))) // self.batch_size

    def _host_indices(self, n: int) -> np.ndarray:
        return np.arange(self.process_index, n, self.process_count)

    def _stream(self, dataset, per_batch: int, rng) -> Iterator[List[int]]:
        """Infinite re-cycling index stream in chunks of per_batch."""
        base = self._host_indices(len(dataset))
        while True:
            order = base[
                rng.permutation(len(base))] if self.shuffle else base
            for i in range(0, len(order) - per_batch + 1, per_batch):
                yield order[i:i + per_batch]

    def _arrays_of(self, dataset):
        """Contiguous (features, targets) arrays when the dataset supports
        the batch-gather fast path (one fancy index per batch instead of a
        per-item Python loop + np.stack), optionally placed in device
        memory (see ``device_resident``)."""
        fn = getattr(dataset, "as_arrays", None)
        if fn is None:
            return None
        arrays = fn()
        if not self._use_device(arrays):
            return arrays
        key = id(dataset)
        if key not in self._dev_arrays:
            import jax.numpy as jnp
            self._dev_arrays[key] = tuple(jnp.asarray(a) for a in arrays)
        return self._dev_arrays[key]

    def _assemble_real(self, weak_arr, unlab_arr, w_ids, u_ids):
        """Real-stream-only gather/reduce/concat as one program — the
        fallback when the SYN dataset lacks ``as_arrays`` but the real
        streams have it (jitted once per loader on the device path)."""
        wt_rank = weak_arr[1].ndim
        ut_rank = unlab_arr[1].ndim

        def asm(wf, wt, uf, ut, wi, ui):
            return _real_stream_batch(wf, wt, uf, ut, wi, ui,
                                      wt_rank, ut_rank)

        if isinstance(weak_arr[0], np.ndarray):
            return asm(*weak_arr, *unlab_arr, w_ids, u_ids)
        if not hasattr(self, "_assemble_real_jit"):
            import jax
            self._assemble_real_jit = jax.jit(asm)
        return self._assemble_real_jit(*weak_arr, *unlab_arr, w_ids, u_ids)

    def _assemble_batch(self, syn_arr, weak_arr, unlab_arr, s_ids, w_ids,
                        u_ids):
        """The ENTIRE batch — syn gather + real-stream gather/reduce/concat
        — as ONE program.

        On the device path every numpy-style op on a jax array is its own
        dispatch (~10 per batch adds up against a ~1 ms step), so the whole
        assembly is jitted once and the loop issues exactly one dispatch
        per batch; on the host path it runs as plain numpy."""
        has_real = weak_arr is not None and unlab_arr is not None
        wt_rank = weak_arr[1].ndim if has_real else 0
        ut_rank = unlab_arr[1].ndim if has_real else 0

        def asm(sf, st, si, wf=None, wt=None, uf=None, ut=None, wi=None,
                ui=None):
            out = {"syn": sf[si], "syn_strong": st[si]}
            if has_real:
                out.update(_real_stream_batch(wf, wt, uf, ut, wi, ui,
                                              wt_rank, ut_rank))
            return out

        args = (*syn_arr, s_ids)
        if has_real:
            args = args + (*weak_arr, *unlab_arr, w_ids, u_ids)
        if isinstance(syn_arr[0], np.ndarray):
            return asm(*args)
        if not hasattr(self, "_assemble_jit"):
            import jax
            self._assemble_jit = jax.jit(asm)
        return self._assemble_jit(*args)

    def _use_device(self, arrays) -> bool:
        if self.device_resident is not None:
            return self.device_resident
        try:
            import jax
            if jax.default_backend() == "cpu":
                return False
            nbytes = sum(a.nbytes for a in arrays)
            return nbytes < 4 * 1024 ** 3
        except Exception:
            return False

    def _items(self, dataset, ids):
        feats, targets = [], []
        arr = self._arrays_of(dataset)
        if arr is not None:
            f, t = arr[0][np.asarray(ids)], arr[1][np.asarray(ids)]
            return np.asarray(f), np.asarray(t)
        for i in ids:
            it = dataset[i]
            feats.append(it[0])
            targets.append(it[1])
        return np.stack(feats), np.stack(targets)

    def _epoch_origin(self, epoch_idx: int):
        """layout='origin' batches (see __init__). Host-side numpy path —
        the origin lineage is not wired for the scanned-epoch fast path
        (epoch_arrays returns None for it)."""
        rng = np.random.default_rng(self.seed * 1_000_003 + epoch_idx)
        syn_idx = self._host_indices(len(self.syn))
        order = rng.permutation(len(syn_idx)) if self.shuffle \
            else np.arange(len(syn_idx))
        b4, b2 = self.batch_size // 4, self.batch_size // 2
        weak_stream = self._stream(self.weak, b4, rng)
        unlab_stream = self._stream(self.unlab, b2, rng)
        strong_stream = self._stream(self.syn, b4, rng)

        def as_strong(t, n_frames):
            # weak-only rows: broadcast over frames (unused by the masked
            # losses; keeps the batch a single static-shape tensor)
            if t.ndim == 2:
                return np.broadcast_to(t[:, None, :],
                                       (t.shape[0], n_frames, t.shape[-1]))
            return t

        def as_weak(t):
            return t.max(axis=1) if t.ndim == 3 else t

        for b in range(len(self)):
            ids = syn_idx[order[b * self.batch_size:
                                (b + 1) * self.batch_size]]
            syn_f, syn_t = self._items(self.syn, ids)
            wf, wt = self._items(self.weak, next(weak_stream))
            uf, ut = self._items(self.unlab, next(unlab_stream))
            sf, st = self._items(self.syn, next(strong_stream))
            n_frames = st.shape[1]
            yield {
                "syn": syn_f, "syn_strong": syn_t,
                "real": np.concatenate([wf, uf, sf]),
                "real_weak": np.concatenate(
                    [as_weak(wt), as_weak(ut), as_weak(st)]),
                "real_strong": np.concatenate(
                    [as_strong(wt, n_frames), as_strong(ut, n_frames),
                     st]),
            }

    def epoch_arrays(self, epoch_idx: int
                     ) -> Optional[Tuple[Dict[str, Any], Dict[str, Any]]]:
        """(arrays, idx) for the scanned-epoch runner
        (steps.make_epoch_runner), or None when any stream lacks the
        device-resident fast path.

        ``arrays``: the streams' contiguous device arrays; ``idx``: stacked
        per-batch index matrices (n_steps, per_batch) drawn with EXACTLY
        the rng consumption order of ``epoch()`` (syn permutation first,
        then interleaved weak/unlab stream pulls), so the two paths see
        identical sample schedules."""
        if self.layout == "origin":
            return None          # origin feeds through _epoch_origin
        syn_arr = self._arrays_of(self.syn)
        if syn_arr is None or isinstance(syn_arr[0], np.ndarray):
            return None
        has_real = self.weak is not None and self.unlab is not None
        if (self.weak is not None) != (self.unlab is not None):
            return None
        weak_arr = unlab_arr = None
        if has_real:
            weak_arr = self._arrays_of(self.weak)
            unlab_arr = self._arrays_of(self.unlab)
            if (weak_arr is None or unlab_arr is None
                    or isinstance(weak_arr[0], np.ndarray)
                    or isinstance(unlab_arr[0], np.ndarray)):
                return None

        rng = np.random.default_rng(self.seed * 1_000_003 + epoch_idx)
        syn_idx = self._host_indices(len(self.syn))
        order = rng.permutation(len(syn_idx)) if self.shuffle \
            else np.arange(len(syn_idx))
        n = len(self)
        ids_syn = np.stack([
            syn_idx[order[b * self.batch_size:(b + 1) * self.batch_size]]
            for b in range(n)])
        arrays = {"syn_f": syn_arr[0], "syn_t": syn_arr[1]}
        idx = {"syn": ids_syn}
        if has_real:
            weak_stream = self._stream(self.weak, self.half, rng)
            unlab_stream = self._stream(self.unlab, self.half, rng)
            ids_w, ids_u = [], []
            for _ in range(n):
                ids_w.append(next(weak_stream))
                ids_u.append(next(unlab_stream))
            arrays.update(weak_f=weak_arr[0], weak_t=weak_arr[1],
                          unlab_f=unlab_arr[0], unlab_t=unlab_arr[1])
            idx.update(weak=np.stack(ids_w), unlab=np.stack(ids_u))
        return arrays, idx

    def epoch(self, epoch_idx: int) -> Iterator[Dict[str, np.ndarray]]:
        if self.layout == "origin":
            yield from self._epoch_origin(epoch_idx)
            return
        rng = np.random.default_rng(self.seed * 1_000_003 + epoch_idx)
        syn_idx = self._host_indices(len(self.syn))
        order = rng.permutation(len(syn_idx)) if self.shuffle \
            else np.arange(len(syn_idx))
        weak_stream = (self._stream(self.weak, self.half, rng)
                       if self.weak is not None else None)
        unlab_stream = (self._stream(self.unlab, self.half, rng)
                        if self.unlab is not None else None)
        syn_arr = self._arrays_of(self.syn)
        weak_arr = self._arrays_of(self.weak) if self.weak is not None \
            else None
        unlab_arr = self._arrays_of(self.unlab) if self.unlab is not None \
            else None

        for b in range(len(self)):
            ids = syn_idx[order[b * self.batch_size:(b + 1) * self.batch_size]]
            # fully-arrayed fast path: the whole batch in ONE (jitted on
            # device) gather/assembly program
            if syn_arr is not None and (
                    weak_stream is None or
                    (weak_arr is not None and unlab_arr is not None)):
                w_ids = u_ids = None
                if weak_stream is not None:
                    w_ids = np.asarray(next(weak_stream))
                    u_ids = np.asarray(next(unlab_stream))
                yield self._assemble_batch(syn_arr, weak_arr, unlab_arr,
                                           np.asarray(ids), w_ids, u_ids)
                continue
            if syn_arr is not None:
                batch = {"syn": syn_arr[0][ids],
                         "syn_strong": syn_arr[1][ids]}
            else:
                syn_items = [self.syn[i] for i in ids]
                batch = {
                    "syn": np.stack([it[0] for it in syn_items]),
                    "syn_strong": np.stack([it[1] for it in syn_items]),
                }
            if weak_stream is not None and unlab_stream is not None:
                w_ids = next(weak_stream)
                u_ids = next(unlab_stream)
                if weak_arr is not None and unlab_arr is not None:
                    # syn lacks as_arrays but the real streams have them:
                    # keep their gather/reduce/concat as one (jitted on
                    # device) program
                    batch.update(self._assemble_real(
                        weak_arr, unlab_arr, np.asarray(w_ids),
                        np.asarray(u_ids)))
                    yield batch
                    continue
                weak_items = [self.weak[i] for i in w_ids]
                unlab_items = [self.unlab[i] for i in u_ids]
                batch["real"] = np.stack(
                    [it[0] for it in weak_items]
                    + [it[0] for it in unlab_items])
                # weak stream carries strong targets → reduce to weak
                weak_targets = [
                    it[1].max(axis=0) if it[1].ndim == 2 else it[1]
                    for it in weak_items]
                pl_targets = [
                    it[1].max(axis=0) if it[1].ndim == 2 else it[1]
                    for it in unlab_items]
                batch["real_weak"] = np.stack(weak_targets + pl_targets)
                # ENA-supervised variant needs real strong targets too
                if all(it[1].ndim == 2
                       for it in weak_items + unlab_items):
                    batch["real_strong"] = np.stack(
                        [it[1] for it in weak_items]
                        + [it[1] for it in unlab_items])
            yield batch


class EvalLoader:
    """Sequential batches of (mel, strong target, filenames) with a padded
    final batch (mask returned) so jit sees one static shape.

    When the dataset exposes ``as_arrays`` the whole eval set is stacked
    once (and, on an accelerator backend, placed in device memory once) so
    each batch is a static slice instead of a per-item load + np.stack +
    per-batch host→device transfer — under the tunnel the transfer alone
    costs more than the model forward."""

    def __init__(self, dataset, batch_size: int = 12,
                 device_resident: Optional[bool] = None):
        self.dataset = dataset
        self.batch_size = batch_size
        self.device_resident = device_resident
        self._prepared = None

    def _prepare(self):
        if self._prepared is not None:
            return self._prepared
        fn = getattr(self.dataset, "as_arrays", None)
        if fn is None:
            return None
        feats, targets = fn()
        names = [self.dataset.filename(i)
                 if hasattr(self.dataset, "filename") else str(i)
                 for i in range(len(self.dataset))]
        pad = (-len(names)) % self.batch_size
        if pad:  # static shapes: repeat the last item into the tail batch
            feats = np.concatenate([feats, np.repeat(feats[-1:], pad, 0)])
            targets = np.concatenate(
                [targets, np.repeat(targets[-1:], pad, 0)])
        use_dev = self.device_resident
        if use_dev is None:
            try:
                import jax
                use_dev = (jax.default_backend() != "cpu"
                           and feats.nbytes < 4 * 1024 ** 3)
            except Exception:
                use_dev = False
        if use_dev:
            import jax.numpy as jnp
            feats = jnp.asarray(feats)
        self._prepared = (feats, targets, names)
        return self._prepared

    def __len__(self):
        return (len(self.dataset) + self.batch_size - 1) // self.batch_size

    def groundtruth_events(self) -> Optional[Dict[str, list]]:
        """{filename: [(label, onset_s, offset_s)]} at the original second
        resolution when the dataset can provide it (the reference assembles
        eval GT from annotation text, evaluation_measures.py:226-248);
        None when only frame targets exist (caller falls back to decoding
        them, losing sub-frame precision). Cached: the Trainer calls this
        every epoch and re-parsing every annotation file each time is pure
        waste (the data is immutable)."""
        if not hasattr(self.dataset, "events"):
            return None
        if not hasattr(self, "_gt_events"):
            name = (self.dataset.filename
                    if hasattr(self.dataset, "filename") else str)
            self._gt_events = {name(i): list(self.dataset.events(i))
                               for i in range(len(self.dataset))}
        return self._gt_events

    def __iter__(self):
        n = len(self.dataset)
        prepared = self._prepare()
        if prepared is not None:
            feats, targets, names = prepared
            for start in range(0, n, self.batch_size):
                stop = start + self.batch_size
                n_valid = min(stop, n) - start
                batch_names = names[start:start + n_valid]
                yield (feats[start:stop], targets[start:stop], batch_names,
                       n_valid)
            return
        for start in range(0, n, self.batch_size):
            ids = list(range(start, min(start + self.batch_size, n)))
            items = [self.dataset[i] for i in ids]
            mel = np.stack([it[0] for it in items])
            target = np.stack([it[1] for it in items])
            names = [self.dataset.filename(i) if hasattr(
                self.dataset, "filename") else str(it[2])
                for i, it in zip(ids, items)]
            n_valid = len(ids)
            if n_valid < self.batch_size:          # pad to static shape
                pad = self.batch_size - n_valid
                mel = np.concatenate([mel, np.repeat(mel[-1:], pad, 0)])
                target = np.concatenate([target,
                                         np.repeat(target[-1:], pad, 0)])
            yield mel, target, names, n_valid
