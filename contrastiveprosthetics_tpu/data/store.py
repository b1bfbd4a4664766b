"""Device-resident tensor store and split views.

The reference's one genuinely TPU-shaped idea — *the entire dataset lives in
accelerator memory and batching is pure index math* (``README.md:35-37``,
``DB23`` in ``load.py:23-273``) — implemented natively: the EMG tensor
(≈54 MB fp32) and glove corpus are ``jax.Array``s resident in HBM; split
selection is a static gather; every "batch" later on is a fused device
gather driven by index matrices.

Layout is tasks-first, matching the reference's post-load transpose
(``load.py:71``): ``emg[(task, person_row, rep, frame, channel)]``.
"""
from __future__ import annotations

import dataclasses
import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from contrastiveprosthetics_tpu.config import Config


@dataclasses.dataclass(frozen=True)
class SplitView:
    """One split's gathered tensors (reference ``DB23.load_valid``,
    ``load.py:233-251``).

    Registered as a pytree (arrays are leaves, geometry is static aux data)
    so views are passed to jitted programs as *arguments*. Closing over them
    instead bakes the whole split tensor into the HLO as a literal — the
    lowered module grows by ~2 bytes per data byte, every fresh process
    recompiles (the compile-cache key covers the baked data), and the remote
    compile service chews through multi-hundred-MB modules (measured 480 s
    cold compiles of the sweep program on v5e before this change).

    Attributes:
      emg_flat:   (n_tasks·P·R·output_dim … flattened frames, emg_dim) — the
                  reference's ``EMG_use``; indexed by the sampler in train.
      emg_groups: (n_tasks·P·R·(100/output_dim), output_dim, emg_dim) — the
                  reference's ``self.tensor``; indexed in eval (voting
                  groups of ``prediction_window_size`` frames).
      glove_flat: (n_tasks·D_g, glove_dim) — the reference's ``GLOVE_use``.
    """

    split: str
    n_tasks: int
    n_people: int
    n_reps: int
    output_dim: int
    D: int
    D_glove: int
    emg_flat: jax.Array
    emg_groups: jax.Array
    glove_flat: jax.Array
    train: bool

    def check_indexing(self) -> None:
        """Port of the reference's inline indexing self-check
        (``load.py:242-249``)."""
        cfg_emg_dim = self.emg_flat.shape[-1]
        if self.train:
            a = self.emg_flat[self.D * 2 + 1]
            per_task = self.emg_flat.reshape(self.n_tasks, -1, cfg_emg_dim)
            b = per_task[2].reshape(-1, cfg_emg_dim)[1]
        else:
            a = self.emg_groups[self.D * 2 + 1]
            per_task = self.emg_groups.reshape(
                self.n_tasks, -1, self.output_dim, cfg_emg_dim
            )
            b = per_task[2][1]
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


jax.tree_util.register_dataclass(
    SplitView,
    data_fields=["emg_flat", "emg_groups", "glove_flat"],
    meta_fields=[
        "split", "n_tasks", "n_people", "n_reps", "output_dim",
        "D", "D_glove", "train",
    ],
)


class DeviceStore:
    """Holds the full normalized dataset on device and produces split views.

    Equivalent of ``DB23.load_stored`` + mask properties
    (``load.py:66-73,157-231``) with the person axis generalized to partial
    ingests: ``people_positions`` names which canonical rows are present.
    """

    def __init__(
        self,
        cfg: Config,
        emg_tasks_first: np.ndarray | jax.Array,
        people_positions: Sequence[int],
        glove: Optional[np.ndarray | jax.Array] = None,
        device: Optional[jax.Device] = None,
    ):
        self.cfg = cfg
        # remembered so Trainer.init_state can COMMIT fresh states to the
        # same device: with the views committed (device_put) and a fresh
        # state uncommitted, jit sees two argument-sharding signatures —
        # (Unspecified…, committed view) on the first call and (committed…,
        # committed view) once the program's own committed output is fed
        # back — and lowers/compiles the whole program twice (measured
        # 13.5 s per extra lowering of the 5-epoch program on v5e)
        self.device = device
        if device is not None:
            self.emg = jax.device_put(jnp.asarray(emg_tasks_first, jnp.float32), device)
        else:
            self.emg = jnp.asarray(emg_tasks_first, jnp.float32)
        self.people_positions = np.asarray(list(people_positions), dtype=np.int64)
        self._row_of = {int(p): i for i, p in enumerate(self.people_positions)}
        if glove is None:
            # contrastive training never reads glove values (the class
            # encoder consumes one-hot labels, models.py:457); provide a
            # 1-frame placeholder corpus
            glove = np.zeros((cfg.max_tasks, 1, cfg.glove_dim), np.float32)
        self.glove = jnp.asarray(glove, jnp.float32)

    # ------------------------------------------------------------------ io
    @classmethod
    def load(
        cls, cfg: Config, data_dir: str, device: Optional[jax.Device] = None
    ) -> "DeviceStore":
        """Load ``emg.npz`` (person-first, as ingested) and ``glove.npz``;
        transpose to the tasks-first device layout (``load.py:71``)."""
        z = np.load(os.path.join(data_dir, "emg.npz"))
        emg = np.transpose(z["emg"], (1, 0, 2, 3, 4))
        glove_path = os.path.join(data_dir, "glove.npz")
        glove = np.load(glove_path)["glove"] if os.path.exists(glove_path) else None
        return cls(cfg, emg, z["people_positions"], glove, device=device)

    # --------------------------------------------------------------- views
    def _people_rows(self, db2: bool) -> np.ndarray:
        """Canonical people_mask (load.py:179-183) mapped to present rows."""
        wanted = self.cfg.people_mask(db2=db2)
        rows = [self._row_of[int(p)] for p in wanted if int(p) in self._row_of]
        if not rows:
            raise ValueError(
                "none of the requested people are present in this store "
                f"(wanted positions {wanted.tolist()}, have "
                f"{self.people_positions.tolist()})"
            )
        return np.asarray(rows, dtype=np.int64)

    def view(self, split: str, db2: bool = False) -> SplitView:
        """Materialize a split view — one fused device gather
        (reference ``load_valid``, ``load.py:233-251``)."""
        cfg = self.cfg
        train = split == "train"
        tasks_mask = jnp.asarray(cfg.tasks_mask())
        people_rows = jnp.asarray(self._people_rows(db2))
        rep_mask = jnp.asarray(cfg.rep_mask(split, db2=db2))

        tensor = self.emg[tasks_mask][:, people_rows][:, :, rep_mask]
        # (n_tasks, P, R, 100, 12)
        n_tasks, P, R = tensor.shape[:3]

        output_dim = cfg.final_window_size if train or not cfg.vote else cfg.prediction_window_size
        emg_flat = tensor.reshape(-1, cfg.emg_dim)
        emg_groups = tensor.reshape(-1, output_dim, cfg.emg_dim)

        if train:
            D = P * R * cfg.final_window_size
        else:
            D = P * R * (cfg.amt_prediction_windows if cfg.vote else 1)

        glove_flat = self.glove[tasks_mask].reshape(-1, cfg.glove_dim)
        view = SplitView(
            split=split,
            n_tasks=int(n_tasks),
            n_people=int(P),
            n_reps=int(R),
            output_dim=int(output_dim),
            D=int(D),
            D_glove=int(self.glove.shape[1]),
            emg_flat=emg_flat,
            emg_groups=emg_groups,
            glove_flat=glove_flat,
            train=train,
        )
        return view
