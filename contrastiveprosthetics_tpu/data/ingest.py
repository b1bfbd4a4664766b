"""Offline ingest: raw Ninapro ``.mat`` files → normalized device tensors.

TPU-native redesign of the reference's triple-Python-loop ingest
(``load.py:103-155``: person × rep × stim = 11,316 sequential scipy calls).
Here each subject's 246 (stim, rep) segments are stacked into one
``(246, 2010, 12)`` batch and preprocessed by a single vmapped+jitted XLA
graph (SOS bandpass → moving RMS → downsample). A scipy backend is kept as
the float64 numerics oracle.

Artifacts (``emg.npz`` / ``glove.npz``) replace the reference's ``emg.pt`` /
``glove.pt`` and store the same normalized tensors:
  emg    (n_people, 41, 6, 100, 12)  — person-first like emg.pt; the store
                                        transposes to tasks-first at load
                                        (reference ``load.py:71``)
  glove  (41, n_glove_people·25, 20)
plus the Welford mean/std (``emg_mean``/``emg_std`` — same artifact names as
the reference's ``data/emg_{mean,std}.npy``).
"""
from __future__ import annotations

import os
from typing import Sequence

import numpy as np
import scipy.io as sio

from contrastiveprosthetics_tpu.config import INGEST_PRESCALE, Config
from contrastiveprosthetics_tpu.ops.stats import RunningStats


def _load_emg_mat(root: str, dbnum: str, p_dir: str, ex: str):
    """Read one exercise file (reference ``load.py:78-83``)."""
    m = sio.loadmat(os.path.join(root, f"db{dbnum}", f"s{p_dir}", f"S{p_dir}_E{ex}_A1.mat"))
    return m["emg"], m["restimulus"], m["rerepetition"]


def _person_location(cfg: Config, person: int) -> tuple[str, str]:
    """Map a canonical person id to (dbnum, subject dir) —
    reference ``load.py:124-128``: id ≥ 40 → DB3, id % 40 recovers the dir."""
    dbnum = "3" if person >= cfg.max_people_d2 else "2"
    subject = person % cfg.max_people_d2 if dbnum == "3" else person
    return dbnum, str(subject + 1)


def _extract_segment(
    cfg: Config, Es, stim: int, rep: int
) -> np.ndarray:
    """First ``ingest_segment_len`` samples of the (stim, rep) mask
    (reference ``load.py:85-93``). Pads by edge-repeat if the recording is
    short (the reference would produce a ragged/failed window there)."""
    ex = int(np.searchsorted(cfg.task_dist.cumsum(), stim))
    emg, stim_arr, rep_arr = Es[ex]
    mask = ((stim_arr == stim) & (rep_arr == rep)).squeeze()
    seg = emg[mask][: cfg.ingest_segment_len]
    if seg.shape[0] < cfg.ingest_segment_len:
        if seg.shape[0] == 0:
            raise ValueError(f"no samples for stim={stim} rep={rep}")
        pad = np.repeat(seg[-1:], cfg.ingest_segment_len - seg.shape[0], axis=0)
        seg = np.concatenate([seg, pad], axis=0)
    return seg.astype(np.float64)


class _JaxPreprocessor:
    """Batched preprocessing of all of a subject's segments on accelerator."""

    def __init__(self, cfg: Config):
        import jax
        import jax.numpy as jnp

        from contrastiveprosthetics_tpu.ops.signal import (
            butter_bandpass_sos,
            preprocess_segment,
        )

        sos = jnp.asarray(butter_bandpass_sos(20, 450, cfg.hz))
        tm = jnp.asarray(cfg.time_mask())
        self._fn = jax.jit(
            jax.vmap(lambda s: preprocess_segment(s, sos, tm))
        )
        self._jnp = jnp

    def __call__(self, segments: np.ndarray) -> np.ndarray:
        out = self._fn(self._jnp.asarray(segments, dtype=self._jnp.float32))
        return np.asarray(out, dtype=np.float64)


class _ScipyPreprocessor:
    """Float64 oracle path (the reference's exact scipy pipeline)."""

    def __init__(self, cfg: Config):
        from scipy import signal as ssig
        from scipy.ndimage import uniform_filter1d

        nyq = cfg.hz / 2
        self._b, self._a = ssig.butter(
            4, [20 / nyq, 450 / nyq], btype="bandpass"
        )
        self._lfilter = ssig.lfilter
        self._uf1d = uniform_filter1d
        self._cfg = cfg

    def __call__(self, segments: np.ndarray) -> np.ndarray:
        cfg = self._cfg
        out = []
        for seg in segments:
            f = self._lfilter(self._b, self._a, seg * INGEST_PRESCALE, axis=0)
            r = np.sqrt(
                self._uf1d(np.square(f), size=cfg.rms_window, axis=0, mode="nearest")
            )[cfg.window_edge : -cfg.window_edge]
            out.append(r[cfg.time_mask()])
        return np.stack(out)


def ingest_emg(
    cfg: Config,
    root: str,
    out_dir: str,
    people_positions: Sequence[int] | None = None,
    complete: bool = False,
    backend: str = "jax",
    verbose: bool = True,
) -> dict:
    """Build the normalized EMG tensor (reference ``DB23.load_dataset``,
    ``load.py:103-155``) and save ``emg.npz`` + ``emg_{mean,std}.npy``."""
    people = cfg.people()
    if people_positions is None:
        people_positions = list(range(len(people)))
    pre = _JaxPreprocessor(cfg) if backend == "jax" else _ScipyPreprocessor(cfg)
    stats = RunningStats(complete=complete)

    n_rows = len(people_positions)
    emg_tensor = np.empty(
        (n_rows, cfg.max_tasks, cfg.max_reps, cfg.final_window_size, cfg.emg_dim),
        dtype=np.float64,
    )
    train_rep_set = set(cfg.rep_train_idx.tolist())

    for row, pos in enumerate(people_positions):
        person = int(people[pos])
        dbnum, p_dir = _person_location(cfg, person)
        Es = (
            _load_emg_mat(root, dbnum, p_dir, "1"),
            _load_emg_mat(root, dbnum, p_dir, "2"),
        )
        segments = np.stack(
            [
                _extract_segment(cfg, Es, stim, rep + 1)
                for stim in range(cfg.max_tasks)
                for rep in range(cfg.max_reps)
            ]
        )  # (41*6, 2010, 12)
        windows = pre(segments).reshape(
            cfg.max_tasks, cfg.max_reps, cfg.final_window_size, cfg.emg_dim
        )
        # stats over train-split windows only (load.py:139-141): every person
        # is a train person, every stim counts, reps restricted to the train
        # split.
        for stim in range(cfg.max_tasks):
            for rep in range(cfg.max_reps):
                if rep in train_rep_set:
                    stats.push(windows[stim, rep])
        emg_tensor[row] = windows
        if verbose:
            print(f"ingested person {person} (db{dbnum}/s{p_dir}) [{row + 1}/{n_rows}]")

    mean, std = stats.mean_std()
    emg_tensor = ((emg_tensor - mean) / std).astype(np.float32)

    os.makedirs(out_dir, exist_ok=True)
    np.savez(
        os.path.join(out_dir, "emg.npz"),
        emg=emg_tensor,
        people_positions=np.asarray(people_positions, dtype=np.int64),
    )
    np.save(os.path.join(out_dir, "emg_mean.npy"), np.asarray(mean, dtype=np.float32))
    np.save(os.path.join(out_dir, "emg_std.npy"), np.asarray(std, dtype=np.float32))
    return {"emg": emg_tensor, "mean": mean, "std": std}


def _load_glove_mat(root: str, p_dir: str, ex: str, angle_idxs: np.ndarray):
    m = sio.loadmat(os.path.join(root, f"s_{p_dir}_angles", f"S{p_dir}_E{ex}_A1.mat"))
    return m["angles"][:, angle_idxs], m["restimulus"], m["rerepetition"]


def ingest_glove(
    cfg: Config,
    root: str,
    out_dir: str,
    people: Sequence[int] | None = None,
    verbose: bool = True,
) -> dict:
    """Build the normalized glove-angle corpus (reference ``Glover``,
    ``utils.py:185-246``) and save ``glove.npz`` + ``glove_{mean,std}.npy``."""
    if people is None:
        people = list(range(cfg.glove_people_start, cfg.glove_people_stop))
    angle_idxs = np.delete(np.arange(22), list(cfg.glove_drop_sensors))
    task_cumsum = cfg.task_dist.cumsum()
    stats = RunningStats()
    train_tasks = cfg.tasks()

    dats = []
    for person in people:
        p_dir = str(person + 1)
        Es = (
            _load_glove_mat(root, p_dir, "1", angle_idxs),
            _load_glove_mat(root, p_dir, "2", angle_idxs),
        )
        all_tasks = []
        for stim in range(cfg.max_tasks):
            ex = int(np.searchsorted(task_cumsum, stim))
            angles, stim_arr, rep_arr = Es[ex]
            mask = stim_arr == stim
            max_rep = int(rep_arr.max())
            reps_angles = [
                angles[(mask & (rep_arr == rep)).flatten()][: cfg.glove_window_size]
                for rep in range(1, max_rep + 1)
            ]
            all_tasks.append(np.concatenate(reps_angles, axis=0))
        lens = {a.shape[0] for a in all_tasks}
        if len(lens) != 1:
            # ragged per-task rep counts: truncate to the shortest so shapes
            # stay static (the reference's np.array would fail here)
            m = min(lens)
            all_tasks = [a[:m] for a in all_tasks]
        all_tasks = np.stack(all_tasks)  # (41, n, 20)
        stats.push(all_tasks[train_tasks].reshape(-1, cfg.glove_dim))
        dats.append(all_tasks)
        if verbose:
            print(f"ingested glove person {person}")

    glove = np.concatenate(dats, axis=1)
    glove = stats.normalize(glove).astype(np.float32)

    os.makedirs(out_dir, exist_ok=True)
    np.savez(os.path.join(out_dir, "glove.npz"), glove=glove)
    np.save(
        os.path.join(out_dir, "glove_mean.npy"),
        np.asarray(stats.mean(), dtype=np.float64),
    )
    np.save(
        os.path.join(out_dir, "glove_std.npy"),
        np.asarray(stats.std(), dtype=np.float64),
    )
    return {"glove": glove, "mean": stats.mean(), "std": stats.std()}
