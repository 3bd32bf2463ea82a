"""Mid-chain sampler checkpoint/resume.

The reference has NO mid-chain resume — a killed sampling run keeps the
draws streamed so far but must restart the chain (and its warmup) from
scratch (SURVEY §5.4; reference sampling.py streams per-draw .npz but
never persists sampler state). Here the chunked-egress loop of
:func:`mile_tpu.train.sampling.run_mclmc` doubles as a checkpoint
boundary: after every drained chunk we atomically persist

- the full sampler state (position, momentum, logdensity, grad),
- the per-chain RNG keys (as raw key data) and tuned hyperparameters,
- the kept-draw counter and the drained chunks themselves,

so a preempted run resumes exactly where it stopped — skipping warmup —
and produces draws BIT-IDENTICAL to an uninterrupted run (the RNG
stream is replayed from the restored keys; test_sampler_resume.py
asserts equality). This is elastic recovery for long TPU sampling jobs
at near-zero cost (one host copy of state per chunk, overlapped with
device compute like the sample egress itself).
"""
from __future__ import annotations

import json
import logging
import os
from pathlib import Path

import jax
import numpy as np

logger = logging.getLogger(__name__)

_SNAPSHOT = 'sampler_state.npz'
_SNAPSHOT_ORBAX = 'sampler_state_orbax'
_META = 'sampler_meta.json'


class SamplerCheckpoint:
    """Atomic snapshot + drained-chunk store under one directory.

    ``fmt='orbax'`` routes the state snapshot through
    :mod:`mile_tpu.train.checkpoint_orbax` (sharded arrays write
    process-local shards on a multi-host mesh); the drained draw chunks
    stay npz either way — they are host-side egress buffers by design.
    """

    def __init__(self, directory: str | Path, fingerprint: dict,
                 fmt: str = 'npz'):
        self.dir = Path(directory)
        self.dir.mkdir(parents=True, exist_ok=True)
        self.fmt = fmt
        # every value participating in determinism must be in the
        # fingerprint — resuming under a different config is an error
        self.fingerprint = {k: (v.tolist() if isinstance(v, np.ndarray)
                                else v) for k, v in fingerprint.items()}

    # ------------------------------------------------------------- save
    def save(self, state_leaves: dict, key_data: np.ndarray,
             tuned: dict, kept_done: int) -> None:
        """Atomically overwrite the snapshot (tmp + rename)."""
        if self.fmt == 'orbax':
            from mile_tpu.train.checkpoint_orbax import save_ensemble

            save_ensemble(self.dir / _SNAPSHOT_ORBAX, {
                'state': {k: np.asarray(v) for k, v in state_leaves.items()},
                'key_data': np.asarray(key_data),
                'tuned': {k: np.asarray(v) for k, v in tuned.items()},
            }, step=0)
        else:
            arrays = {f'state_{k}': np.asarray(v)
                      for k, v in state_leaves.items()}
            arrays['key_data'] = np.asarray(key_data)
            arrays.update({f'tuned_{k}': np.asarray(v)
                           for k, v in tuned.items()})
            tmp = self.dir / (_SNAPSHOT + '.tmp')
            with open(tmp, 'wb') as f:
                np.savez(f, **arrays)
            os.replace(tmp, self.dir / _SNAPSHOT)
        meta = {'fingerprint': self.fingerprint, 'kept_done': int(kept_done)}
        tmp = self.dir / (_META + '.tmp')
        tmp.write_text(json.dumps(meta))
        os.replace(tmp, self.dir / _META)

    def save_warmup_trace(self, trace: np.ndarray) -> None:
        """Persist the thinned warmup trajectory so a resumed run's
        artifacts match an uninterrupted one (keep_warmup parity)."""
        tmp = self.dir / 'warmup_trace.npy.tmp'
        with open(tmp, 'wb') as f:  # np.save(path) would append '.npy'
            np.save(f, np.asarray(trace))
        os.replace(tmp, self.dir / 'warmup_trace.npy')

    def load_warmup_trace(self):
        p = self.dir / 'warmup_trace.npy'
        return np.load(p) if p.exists() else None

    def save_chunk(self, index: int, positions: np.ndarray,
                   aux: dict) -> None:
        """``aux``: per-draw statistics (flat dict of arrays)."""
        arrays = {f'aux_{k}': np.asarray(v) for k, v in aux.items()}
        tmp = self.dir / f'chunk_{index:06d}.npz.tmp'
        with open(tmp, 'wb') as f:
            np.savez(f, positions=positions, **arrays)
        os.replace(tmp, self.dir / f'chunk_{index:06d}.npz')

    # ------------------------------------------------------------- load
    def load(self):
        """Return (state_leaves, key_data, tuned, kept_done) or None."""
        meta_path = self.dir / _META
        orbax_path = self.dir / _SNAPSHOT_ORBAX
        snap_path = self.dir / _SNAPSHOT
        use_orbax = self.fmt == 'orbax' and orbax_path.exists()
        if not (meta_path.exists() and (snap_path.exists() or use_orbax)):
            return None
        meta = json.loads(meta_path.read_text())
        if meta.get('fingerprint') != self.fingerprint:
            logger.warning(
                'sampler checkpoint at %s belongs to a different run '
                '(fingerprint mismatch) — ignoring it', self.dir)
            return None
        if use_orbax:
            from mile_tpu.train.checkpoint_orbax import load_ensemble

            tree = load_ensemble(orbax_path)
            state, tuned = tree['state'], tree['tuned']
            key_data = tree['key_data']
        else:
            with np.load(snap_path) as d:
                state = {k[len('state_'):]: d[k] for k in d.files
                         if k.startswith('state_')}
                tuned = {k[len('tuned_'):]: d[k] for k in d.files
                         if k.startswith('tuned_')}
                key_data = d['key_data']
        logger.info('resuming sampler from %s at %d kept draws',
                    self.dir, meta['kept_done'])
        return state, key_data, tuned, int(meta['kept_done'])

    def load_chunks(self) -> tuple[list, list]:
        """Drained chunks of the interrupted run, in order; aux chunks
        come back as dicts matching what :meth:`save_chunk` received."""
        host_chunks, aux_chunks = [], []
        for p in sorted(self.dir.glob('chunk_*.npz')):
            with np.load(p) as d:
                host_chunks.append(d['positions'])
                aux_chunks.append({k[len('aux_'):]: d[k] for k in d.files
                                   if k.startswith('aux_')})
        return host_chunks, aux_chunks

    # ---------------------------------------------------------- cleanup
    def clear(self) -> None:
        """Remove snapshot + chunks after a successful run (the draws
        live in the experiment's samples/ dir from here on)."""
        import shutil

        for p in self.dir.glob('chunk_*.npz'):
            p.unlink()
        for name in (_SNAPSHOT, _META, 'warmup_trace.npy'):
            (self.dir / name).unlink(missing_ok=True)
        shutil.rmtree(self.dir / _SNAPSHOT_ORBAX, ignore_errors=True)
        try:
            self.dir.rmdir()
        except OSError:
            pass  # directory not empty (foreign files) — leave it


def key_data_of(keys: jax.Array) -> np.ndarray:
    return np.asarray(jax.random.key_data(keys))


def keys_from_data(data: np.ndarray) -> jax.Array:
    return jax.random.wrap_key_data(jax.numpy.asarray(data))
