"""Frozen configuration for the TPU-native ContrastiveProsthetics framework.

This module replaces the reference's module-level globals (reference
``code/constants.py``) with an immutable, explicit configuration object.

The reference seeds numpy with 0 at import time (``constants.py:3``) and the
resulting shuffles of subjects and tasks define the *canonical orderings* that
are baked into every shipped artifact (voting.npy, confusion_matrix.npy, ...).
We reproduce those orderings as literals (verified by a golden test that
re-derives them from numpy's seeded MT19937 stream) so the splits are explicit
and independent of any RNG library version.

Quirk ledger (each reproduced behind a compat flag, default = fixed):
  * ``compat_uint8_time_mask`` — reference ``load.py:115`` builds the
    downsample index with ``np.arange(0, 2000, 20, dtype=np.uint8)`` which
    wraps mod 256, so the "1 s window @ 100 Hz" actually samples (with
    repeats) the first ~126 ms of the RMS'd signal. Default here: a true
    20-step downsample over the full second.
  * ``compat_shared_steplr`` — reference ``train.py:79-80`` points both StepLR
    schedulers at the glove optimizer, so the EMG learning rate never decays
    during cross-validation. Default here: each optimizer gets its own
    schedule.
  * ``compat_complete_stats`` — reference ``utils.py:100-124``: with
    ``complete=True`` the saved mean collapses to a scalar but ``std()``
    recomputes the per-channel std, ignoring the flag (the shipped
    ``emg_mean.npy`` is shape ``()`` while ``emg_std.npy`` is ``(12,)``).
    We reproduce exactly that pairing when the flag is set.
  * ``compat_checkpoint_on_max`` — reference ``train.py:122-126`` saves the
    checkpoint whenever ``loss_val <= max(val_losses so far)`` — *max*, so
    nearly every epoch overwrites the "best" checkpoint and the weights that
    reach test are close to last-epoch weights. Default here: checkpoint on
    val-loss *improvement* (``<= min``). Compat: the reference's max rule.
  * ``compat_full_voting_bound`` — the reference's *current* voting loop
    (``models.py:153``) iterates ``range(1, PREDICTION_WINDOW)`` = 249
    prefix columns, where every column past the 25-frame window just
    repeats the full-window vote (``pred[:win]`` clamps); its ``y_pred``
    is then the 25-frame vote. The shipped ``voting.npy`` artifact has 24
    columns (produced by an older ``range(1, PREDICTION_WINDOW_SIZE)``).
    Default here: the 24-column artifact shape. Compat: the current-code
    249-column curve and 25-frame y_pred.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import numpy as np

# the reference's ×2¹⁰ EMG prescale before filtering (load.py:87) — the
# single source for ingest (data/ingest.py), signal ops (ops/signal.py),
# serving (serve/stream.py), and the fused tick-chain kernel
# (ops/pallas_ops.py §3)
INGEST_PRESCALE = 2.0**10

# ---------------------------------------------------------------------------
# Canonical seed-0 orderings (reference constants.py:18-21,37-41).
# Derived from: np.random.seed(0); permutation(40); permutation(6);
# shuffle(arange(1,18)); shuffle(arange(18,41)) — in that exact call order.
# Golden test: tests/test_config.py::test_canonical_orderings_match_seed0
# ---------------------------------------------------------------------------
D2_IDXS: Tuple[int, ...] = (
    22, 20, 25, 4, 10, 15, 28, 11, 18, 29, 27, 35, 37, 2, 39, 30, 34, 16,
    36, 8, 13, 5, 17, 14, 33, 7, 32, 1, 26, 12, 31, 24, 6, 23, 21, 19, 9,
    38, 3, 0,
)
D3_IDXS: Tuple[int, ...] = (3, 1, 4, 5, 2, 0)
TASKS_A: Tuple[int, ...] = (
    4, 12, 15, 11, 17, 8, 10, 2, 14, 9, 7, 13, 6, 5, 16, 1, 3,
)
TASKS_B: Tuple[int, ...] = (
    40, 33, 34, 31, 30, 39, 26, 36, 28, 22, 38, 23, 37, 18, 35, 20, 32, 29,
    24, 21, 27, 25, 19,
)

# DB3 subjects used (reference constants.py:6); ids are remapped to 40..45
# via ``pl + MAX_PEOPLE_D2 - 1`` (constants.py:11).
PEOPLE_D3_RAW: Tuple[int, ...] = (2, 3, 4, 5, 8, 9)


@dataclasses.dataclass(frozen=True)
class Config:
    """All compile-time constants of the pipeline (reference constants.py)."""

    # --- subjects ---------------------------------------------------------
    max_people_d2: int = 40
    max_people_d3: int = 6

    # --- tasks ------------------------------------------------------------
    n_tasks_e1: int = 17          # exercise E1 stimulus count (TASK_DIST[0])
    n_tasks_e2: int = 23          # exercise E2 stimulus count (TASK_DIST[1])

    # --- repetitions (1-based rep labels; constants.py:50-54) --------------
    reps: Tuple[int, ...] = (1, 3, 4, 6, 2, 5)

    # --- signal geometry (constants.py:60-94) ------------------------------
    hz: int = 2000
    downsample: int = 100                  # frames/sec after downsampling
    rms_window: int = 11                   # in raw-sample space
    total_window_size: int = 2000          # 1 s of raw signal
    vote: bool = True
    prediction_window_ms: int = 250

    # --- glove corpus (constants.py:81-85,96) ------------------------------
    hz_glove: int = 25
    glove_people_start: int = 28           # utils.py:189 — arange(28, 67)
    glove_people_stop: int = 67
    glove_drop_sensors: Tuple[int, ...] = (5, 10)  # NaN / noisy sensors
    glove_dim: int = 20
    emg_dim: int = 12

    # --- paths --------------------------------------------------------------
    data_dir: str = "data"                 # where emg.npz / glove.npz live

    # --- rng -----------------------------------------------------------------
    seed: int = 42                         # training-time seed (train.py:21-22)

    # --- compat quirks (see module docstring) -------------------------------
    compat_uint8_time_mask: bool = False
    compat_shared_steplr: bool = False
    compat_complete_stats: bool = False
    compat_full_voting_bound: bool = False
    compat_checkpoint_on_max: bool = False

    # ------------------------------------------------------------------ derived
    @property
    def max_people(self) -> int:
        return self.max_people_d2 + self.max_people_d3

    @property
    def max_tasks(self) -> int:
        # 17 + 23 stimuli + rest (class 0)  (constants.py:45-46)
        return self.n_tasks_e1 + self.n_tasks_e2 + 1

    @property
    def task_dist(self) -> np.ndarray:
        return np.array([self.n_tasks_e1, self.n_tasks_e2])

    @property
    def max_reps(self) -> int:
        return len(self.reps)

    @property
    def reps_train(self) -> Tuple[int, ...]:
        return self.reps[:-2]              # (1, 3, 4, 6)[:-1] handled below

    @property
    def reps_test(self) -> Tuple[int, ...]:
        return self.reps[-2:]              # (2, 5)

    # rep masks as 0-based indices (load.py:43-46)
    @property
    def rep_train_idx(self) -> np.ndarray:
        r = np.asarray(self.reps_train) - 1
        return r[:-1]                      # [0, 2, 3]

    @property
    def rep_val_idx(self) -> np.ndarray:
        r = np.asarray(self.reps_train) - 1
        return r[-1:]                      # [5]

    @property
    def rep_test_idx(self) -> np.ndarray:
        return np.asarray(self.reps_test) - 1  # [1, 4]

    @property
    def factor(self) -> int:
        return self.hz // self.downsample  # 20

    @property
    def window_edge(self) -> int:
        return (self.rms_window - 1) // 2  # 5

    @property
    def final_window_size(self) -> int:
        return self.total_window_size // self.factor  # 100

    @property
    def prediction_window_size(self) -> int:
        # 250 ms at 100 Hz → 25 frames (constants.py:77)
        return self.prediction_window_ms * self.downsample // 1000

    @property
    def amt_prediction_windows(self) -> int:
        return self.final_window_size // self.prediction_window_size  # 4

    @property
    def n_voting_cols(self) -> int:
        # Shipped voting.npy has 24 columns: prefix lengths 1..24
        # (models.py:153 iterates range(1, PREDICTION_WINDOW) but the
        # artifacts were produced with range(1, PREDICTION_WINDOW_SIZE)).
        # compat_full_voting_bound reproduces the current code's 249
        # columns (prefixes past the window repeat the full-window vote).
        if self.compat_full_voting_bound:
            return self.prediction_window_ms - 1
        return self.prediction_window_size - 1

    @property
    def glove_factor(self) -> int:
        return self.hz // self.hz_glove    # 80

    @property
    def glove_window_size(self) -> int:
        return self.total_window_size // self.glove_factor  # 25

    @property
    def ingest_segment_len(self) -> int:
        # raw samples taken per (stim, rep): window + RMS edges (load.py:93)
        return self.total_window_size + 2 * self.window_edge  # 2010

    # ---------------------------------------------------------------- splits
    def people_d2(self) -> np.ndarray:
        """DB2 subject ids in canonical shuffled order (constants.py:20)."""
        return np.asarray(D2_IDXS)

    def people_d3(self) -> np.ndarray:
        """DB3 remapped ids (40..45) in canonical shuffled order."""
        remapped = np.asarray(PEOPLE_D3_RAW) + self.max_people_d2 - 1
        return remapped[np.asarray(D3_IDXS)]

    def people(self) -> np.ndarray:
        """Canonical person ordering — rows of the ingested EMG tensor."""
        return np.concatenate([self.people_d2(), self.people_d3()])

    def tasks(self) -> np.ndarray:
        """Canonical shuffled task ordering (40 non-rest stimuli)."""
        return np.concatenate([np.asarray(TASKS_A), np.asarray(TASKS_B)])

    def tasks_mask(self) -> np.ndarray:
        """Shuffled tasks + rest appended — row order of every view
        (load.py:157-163)."""
        return np.concatenate([self.tasks(), [0]]).astype(np.int64)

    def people_mask(self, db2: bool = False) -> np.ndarray:
        """Default subject view: DB3-only (amputees); DB2 with ``db2=True``
        (load.py:179-183). Values index the person axis of the EMG tensor."""
        if db2:
            return np.asarray(D2_IDXS, dtype=np.int64)
        return np.asarray(D3_IDXS, dtype=np.int64) + self.max_people_d2

    def rep_mask(self, split: str, db2: bool = False) -> np.ndarray:
        """Rep indices for a split (load.py:190-203)."""
        if split == "train":
            if db2:
                return np.concatenate([self.rep_train_idx, self.rep_test_idx])
            return self.rep_train_idx
        if split == "val":
            return self.rep_val_idx
        if split == "test":
            return self.rep_val_idx if db2 else self.rep_test_idx
        raise ValueError(f"unknown split {split!r}")

    def time_mask(self) -> np.ndarray:
        """Downsample index into the RMS'd window (load.py:115).

        Default: a true 20-step downsample of the full 2000-frame second.
        Compat: reproduce the uint8 wraparound (indices 0..252 with repeats).
        """
        if self.compat_uint8_time_mask:
            return np.arange(
                0, self.total_window_size, self.factor, dtype=np.uint8
            ).astype(np.int64)
        return np.arange(0, self.total_window_size, self.factor, dtype=np.int64)

    def train_person_set(self) -> np.ndarray:
        """Person ids whose train-rep windows feed normalization stats
        (load.py:139: ``person in TRAIN_PEOPLE`` — all 46 people)."""
        return self.people()


DEFAULT_CONFIG = Config()


def compat_config(cfg: Config = DEFAULT_CONFIG) -> Config:
    """A config with every reference quirk enabled — the artifact-faithful
    mode (each quirk documented in the module-docstring ledger)."""
    return dataclasses.replace(
        cfg,
        compat_uint8_time_mask=True,
        compat_shared_steplr=True,
        compat_complete_stats=True,
        compat_full_voting_bound=True,
        compat_checkpoint_on_max=True,
    )


def derive_canonical_orderings():
    """Re-derive the seed-0 orderings from numpy (for the golden test)."""
    rng_state = np.random.get_state()
    try:
        np.random.seed(0)
        d2 = np.random.permutation(40)
        d3 = np.random.permutation(6)
        a = np.arange(1, 18, dtype=np.uint8)
        b = np.arange(18, 41, dtype=np.uint8)
        np.random.shuffle(a)
        np.random.shuffle(b)
        return d2, d3, a, b
    finally:
        np.random.set_state(rng_state)
