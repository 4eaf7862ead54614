"""End-to-end loop-closure pipeline: the batch_bin_test driver, TPU-native.

Replays a sequence (test/batch_bin_test.cpp:105-248): per scan,
build descriptor (device) -> queryRangedKNN (device search + batched cascade +
batched GMM, host candidate bookkeeping) -> record TFPN -> add to DB -> advance
the temporal insertion window. Produces an outcome file scored by eval/pr_mpe.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Callable, List, Optional

import numpy as np

from contour_context_tpu.config import PipelineConfig
from contour_context_tpu.db import ContourDB
from contour_context_tpu.eval.evaluator import ContLCDEvaluator
from contour_context_tpu.ops.descriptor import build_descriptor
from contour_context_tpu.utils.io import pad_points, read_kitti_bin
from contour_context_tpu.utils.profiling import SequentialTimeProfiler


def se2_mat_from_params(T3: np.ndarray) -> np.ndarray:
    c, s = math.cos(T3[2]), math.sin(T3[2])
    return np.array([[c, -s, T3[0]], [s, c, T3[1]], [0.0, 0.0, 1.0]])


@dataclass
class LoopResult:
    q_seq: int
    cand_seq: Optional[int]
    correlation: float
    tfpn: int


class LoopClosurePipeline:
    """Streaming per-scan loop: the reference's BatchBinSpinner equivalent."""

    def __init__(self, cfg: PipelineConfig, evaluator: ContLCDEvaluator,
                 capacity: int = 8192, block_for_timing: bool = False):
        self.cfg = cfg
        self.evaluator = evaluator
        self.db = ContourDB(cfg, capacity)
        self.stp = SequentialTimeProfiler("cont2-tpu batch")
        self.results: List[LoopResult] = []
        self.block = block_for_timing
        self._load_points: Callable[[str], np.ndarray] = \
            lambda p: read_kitti_bin(p, cfg.cm.max_points)

    def set_point_loader(self, fn: Callable[[str], np.ndarray]) -> None:
        self._load_points = fn

    def spin_once(self) -> bool:
        """Process the next scan; returns False when the sequence ends."""
        import jax

        ev = self.evaluator
        if not ev.load_new_scan():
            return False
        info = ev.curr_scan
        cfg = self.cfg

        self.stp.lap()
        self.stp.start()
        pts = self._load_points(info.fpath)
        desc = build_descriptor(pad_points(pts, cfg.cm.max_points), cfg.cm, cfg.gmm)
        if self.block:
            jax.block_until_ready(desc)
        self.stp.record("make bev")

        res = self.db.query_ranged_knn(desc, profiler=self.stp)

        if res is None:
            pred = ev.add_prediction(info.seq, 0.0)
            lr = LoopResult(info.seq, None, 0.0, pred.tfpn)
        else:
            gidx, corr, T3 = res
            cand_seq = self.db.seq_of_gidx[gidx]
            pred = ev.add_prediction(info.seq, corr, cand_seq,
                                     se2_mat_from_params(T3),
                                     cfg.cm.n_row, cfg.cm.n_col, cfg.cm.reso_row)
            lr = LoopResult(info.seq, cand_seq, corr, pred.tfpn)
        self.results.append(lr)

        self.stp.start()
        self.db.add_scan(desc, info.seq, info.ts)
        self.db.push_and_balance(info.ts)
        self.stp.record("Update database")
        return True

    def run(self, max_scans: Optional[int] = None, progress_every: int = 0) -> None:
        n = 0
        while self.spin_once():
            n += 1
            if progress_every and n % progress_every == 0:
                tp = sum(1 for r in self.results if r.tfpn == 0)
                fp = sum(1 for r in self.results if r.tfpn == 1)
                fn = sum(1 for r in self.results if r.tfpn == 3)
                print("[%d] tp=%d fp=%d fn=%d" % (n, tp, fp, fn), flush=True)
            if max_scans is not None and n >= max_scans:
                break

    def save_outcome(self, path: str) -> None:
        self.evaluator.save_prediction_results(path)


def run_batch(fpath_pose: str, fpath_laser: str, outcome_path: str,
              cfg: Optional[PipelineConfig] = None,
              max_scans: Optional[int] = None) -> LoopClosurePipeline:
    """The cont2_batch_bin_test entry point (batch_bin_test.cpp:261-307)."""
    cfg = cfg or PipelineConfig()
    ev = ContLCDEvaluator(fpath_pose, fpath_laser, cfg.correlation_thres)
    pipe = LoopClosurePipeline(cfg, ev, capacity=max(len(ev) + 8, 64))
    pipe.run(max_scans=max_scans, progress_every=200)
    pipe.save_outcome(outcome_path)
    pipe.stp.print_screen()
    return pipe
