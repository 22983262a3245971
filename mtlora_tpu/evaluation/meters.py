"""Per-task streaming evaluation meters.

Rebuild of reference ``evaluation/`` as pure accumulator pytrees: each
meter is (init_state, update(state, pred, gt) -> state, compute(state))
where ``update`` is jit-safe (static shapes, sum-only accumulation) so it
runs on device inside the eval loop and the states reduce across a DP
mesh with a plain tree-sum — fixing the reference's unreduced-meters
limitation (SURVEY.md section 2.2).

Numerical contracts preserved per meter (reference file:line):
  - SemsegMeter (eval_semseg.py:88-148): per-class TP/FP/FN -> IoU, 21
    classes PASCAL (bg included) / 40 NYUD, ignore 255.
  - HumanPartsMeter (eval_human_parts.py:86-133): 7-class IoU.
  - NormalsMeterV1 (eval_normals_v1.py): acos(dot) degrees; the published
    'rmse' equals 'mean' (copy quirk at :63) — preserved.
  - NormalsMeterV2 (eval_normals_v2.py): 2*atan2(|p-g|,|p+g|) degrees.
  - SaliencyMeterWithBeta (eval_sal_beta.py): 19 thresholds, F-beta
    (beta^2=0.3); preserves the reference's double-sigmoid quirk (update
    receives 255*sigmoid(logit) and sigmoids again, :45-55).
  - SaliencyMeterWithNoBeta (eval_sal_no_beta.py): 15 thresholds in
    [0.2, 0.9], per-image jaccard/precision/recall averaged over images.
  - DepthMeter (eval_depth.py:65-108): masked rmse / log_rmse.
  - EdgeMeter (eval_edge.py:23-50): balanced-CE proxy metric on
    pred/255 probabilities (true eval would be seism odsF).
  - get_output (evaluate_utils.py:20-38): normals -> (unit+1)*255/2,
    seg -> argmax, sal/edge -> 255*sigmoid. NHWC layout here.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from mtlora_tpu.train.losses import balanced_bce_logits

PASCAL_SEMSEG_CLASSES = 21
NYUD_SEMSEG_CLASSES = 40
HUMAN_PARTS_CLASSES = 7


def get_output(output: jnp.ndarray, task: str) -> jnp.ndarray:
    """Post-process NHWC logits into meter inputs."""
    if task == "normals":
        norm = jnp.linalg.norm(output, axis=-1, keepdims=True)
        unit = output / jnp.maximum(norm, 1e-12)
        return (unit + 1.0) * 255.0 / 2.0
    if task in ("semseg", "human_parts"):
        return jnp.argmax(output, axis=-1)
    if task in ("edge", "sal"):
        return jnp.squeeze(255.0 * jax.nn.sigmoid(output), axis=-1)
    if task == "depth":
        return jnp.squeeze(output, axis=-1)
    raise ValueError(f"unknown task {task}")


class MeterBase:
    def init(self) -> Dict:
        raise NotImplementedError

    def update(self, state: Dict, pred, gt, weight=None) -> Dict:
        """``weight``: optional per-sample [B] 0/1 validity — rows with
        weight 0 (SPMD padding of the ragged final global batch) must
        contribute EXACTLY nothing; meters are sum-accumulators, so a
        0-weight row is exact."""
        raise NotImplementedError

    def compute(self, state: Dict, verbose: bool = False) -> Dict:
        raise NotImplementedError


def _squeeze_label(gt):
    if gt.ndim == 4 and gt.shape[-1] == 1:
        gt = gt[..., 0]
    return gt


def _row_ignore(gt, weight, fill):
    """Overwrite whole samples (rows) with ``weight == 0`` by the
    meter's ignore value, so every mask-based accumulator skips them."""
    if weight is None:
        return gt
    w = weight.reshape((gt.shape[0],) + (1,) * (gt.ndim - 1))
    return jnp.where(w > 0, gt, jnp.asarray(fill, gt.dtype))


class ConfusionIoUMeter(MeterBase):
    """Shared TP/FP/FN IoU machinery for semseg / human parts."""

    def __init__(self, n_classes: int, ignore_index: int = 255):
        self.n_classes = n_classes
        self.ignore_index = ignore_index

    def init(self):
        z = jnp.zeros((self.n_classes,), jnp.float64
                      if jax.config.jax_enable_x64 else jnp.float32)
        return {"tp": z, "fp": z, "fn": z}

    def update(self, state, pred, gt, weight=None):
        K = self.n_classes
        gt = _squeeze_label(gt).astype(jnp.int32)
        gt = _row_ignore(gt, weight, self.ignore_index)
        pred = pred.astype(jnp.int32)
        valid = gt != self.ignore_index
        idx = jnp.where(valid, gt * K + pred, K * K)
        cm = jnp.bincount(idx.reshape(-1), length=K * K + 1)[: K * K]
        cm = cm.reshape(K, K).astype(state["tp"].dtype)
        tp = jnp.diagonal(cm)
        fp = cm.sum(axis=0) - tp
        fn = cm.sum(axis=1) - tp
        return {"tp": state["tp"] + tp, "fp": state["fp"] + fp,
                "fn": state["fn"] + fn}

    def compute(self, state, verbose=False):
        tp = np.asarray(state["tp"], np.float64)
        fp = np.asarray(state["fp"], np.float64)
        fn = np.asarray(state["fn"], np.float64)
        jac = tp / np.maximum(tp + fp + fn, 1e-8)
        return {"jaccards_all_categs": jac.tolist(),
                "mIoU": float(jac.mean())}


class SemsegMeter(ConfusionIoUMeter):
    def __init__(self, database: str = "PASCALContext"):
        if database == "PASCALContext":
            super().__init__(PASCAL_SEMSEG_CLASSES)
        elif database == "NYUD":
            super().__init__(NYUD_SEMSEG_CLASSES)
        else:
            raise NotImplementedError(database)


class HumanPartsMeter(ConfusionIoUMeter):
    def __init__(self, database: str = "PASCALContext"):
        assert database == "PASCALContext"
        super().__init__(HUMAN_PARTS_CLASSES)


class NormalsMeter(MeterBase):
    """Combines the reference's V1 (acos) and V2 (atan2) formulas."""

    def init(self):
        z = jnp.zeros((), jnp.float32)
        return {"v1_sum": z, "v1_1125": z, "v1_225": z, "v1_30": z,
                "v1_n": z, "v2_sum": z, "v2_n": z}

    def update(self, state, pred, gt, weight=None):
        # pred: [B,H,W,3] in 0..255 (get_output); gt: [B,H,W,3] floats
        p = 2.0 * pred.astype(jnp.float32) / 255.0 - 1.0
        g = _row_ignore(gt.astype(jnp.float32), weight, 255.0)
        # ---- V1 (eval_normals_v1.py:31-55): mask where ANY per-element
        # 255; the valid mask used is channel-0's.
        invalid = g == 255.0
        p1 = jnp.where(invalid, 0.0, p)
        g1 = jnp.where(invalid, 0.0, g)
        dot = jnp.clip(jnp.sum(p1 * g1, axis=-1), -1.0, 1.0)
        deg = jnp.degrees(jnp.arccos(dot))
        valid1 = jnp.logical_not(invalid[..., 0])
        deg = jnp.where(valid1, deg, 0.0)
        n1 = valid1.sum().astype(jnp.float32)
        upd = {
            "v1_sum": state["v1_sum"] + deg.sum(),
            "v1_1125": state["v1_1125"]
            + 100.0 * jnp.where(valid1, deg < 11.25, False).sum(),
            "v1_225": state["v1_225"]
            + 100.0 * jnp.where(valid1, deg < 22.5, False).sum(),
            "v1_30": state["v1_30"]
            + 100.0 * jnp.where(valid1, deg < 30.0, False).sum(),
            "v1_n": state["v1_n"] + n1,
        }
        # ---- V2 (eval_normals_v2.py:31-44): normalize both, angle via
        # atan2; valid where ALL channels != 255.
        def unit(v):
            n = jnp.linalg.norm(v, axis=-1, keepdims=True)
            return jnp.where(n == 0, 0.0, v / jnp.where(n == 0, 1.0, n))

        p2, g2 = unit(p), unit(g)
        ang = jnp.degrees(2.0 * jnp.arctan2(
            jnp.linalg.norm(p2 - g2, axis=-1),
            jnp.linalg.norm(p2 + g2, axis=-1)))
        valid2 = jnp.all(g != 255.0, axis=-1)
        upd["v2_sum"] = state["v2_sum"] + jnp.where(valid2, ang, 0.0).sum()
        upd["v2_n"] = state["v2_n"] + valid2.sum().astype(jnp.float32)
        return upd

    def compute(self, state, verbose=False):
        n1 = max(float(state["v1_n"]), 1.0)
        n2 = max(float(state["v2_n"]), 1.0)
        mean_v1 = float(state["v1_sum"]) / n1
        mean_v2 = float(state["v2_sum"]) / n2
        return {
            "mean": mean_v1,
            "rmse": mean_v1,       # reference copy quirk preserved
            "mean_v2": mean_v2,
            "rmse_v2": mean_v2,
            "11.25": float(state["v1_1125"]) / n1,
            "22.5": float(state["v1_225"]) / n1,
            "30": float(state["v1_30"]) / n1,
        }


class SaliencyMeter(MeterBase):
    """Beta (19-threshold F-beta) + no-beta (15-threshold per-image
    jaccard / F) saliency meters fused into one state."""

    def __init__(self, ignore_index: int = 255, threshold_step: float = 0.05,
                 beta_squared: float = 0.3):
        self.ignore_index = ignore_index
        self.beta_squared = beta_squared
        self.beta_thresholds = np.arange(threshold_step, 1.0,
                                         threshold_step)  # 19
        self.nb_thresholds = np.linspace(0.2, 0.9, 15)

    def init(self):
        nb = len(self.beta_thresholds)
        nn_ = len(self.nb_thresholds)
        z = jnp.zeros
        return {"tp": z((nb,)), "pred_pos": z((nb,)), "act_pos": z((nb,)),
                "jac_sum": z((nn_,)), "prec_sum": z((nn_,)),
                "rec_sum": z((nn_,)), "n_img": z(())}

    def update(self, state, pred, gt, weight=None):
        # pred: [B,H,W] 0..255 (get_output); gt: [B,H,W(,1)] binary
        gt = _squeeze_label(gt).astype(jnp.float32)
        p01 = pred.astype(jnp.float32) / 255.0
        gtb = _row_ignore(gt, weight, 255.0)
        valid = gtb != self.ignore_index
        # ---- beta meter: double-sigmoid quirk (eval_sal_beta.py:38,55)
        pbeta = jax.nn.sigmoid(p01)
        gl = gtb.astype(jnp.int32)

        def beta_at(thr):
            f = jnp.where(valid, (pbeta >= thr), False)
            return (jnp.sum(f & (gl > 0)).astype(jnp.float32),
                    jnp.sum(f).astype(jnp.float32),
                    jnp.sum(jnp.where(valid, gl, 0)).astype(jnp.float32))

        tps, pps, aps = jax.lax.map(
            beta_at, jnp.asarray(self.beta_thresholds, jnp.float32))
        # ---- no-beta meter: per-image jaccard/prec/rec. This meter has
        # NO ignore mask (reference quirk), so 0-weight padded rows are
        # excluded by weighting the per-image sums, not the gt.
        gb = gt > 0.5  # gt already binarized in the dataset
        wrow = (jnp.ones((pred.shape[0],), jnp.float32)
                if weight is None else weight.astype(jnp.float32))

        def nb_at(thr):
            mask = p01 > thr  # [B,H,W]
            inter = jnp.sum(gb & mask, axis=(1, 2)).astype(jnp.float32)
            union = jnp.sum(gb | mask, axis=(1, 2)).astype(jnp.float32)
            gsum = jnp.sum(gb, axis=(1, 2)).astype(jnp.float32)
            msum = jnp.sum(mask, axis=(1, 2)).astype(jnp.float32)
            both_empty = jnp.isclose(gsum, 0) & jnp.isclose(msum, 0)
            jac = jnp.where(both_empty, 1.0,
                            inter / jnp.maximum(union, 1e-12))
            prec = inter / (msum + 1e-12)
            rec = inter / (gsum + 1e-12)
            return ((jac * wrow).sum(), (prec * wrow).sum(),
                    (rec * wrow).sum())

        jacs, precs, recs = jax.lax.map(
            nb_at, jnp.asarray(self.nb_thresholds, jnp.float32))
        B = wrow.sum()
        return {"tp": state["tp"] + tps,
                "pred_pos": state["pred_pos"] + pps,
                "act_pos": state["act_pos"] + aps,
                "jac_sum": state["jac_sum"] + jacs,
                "prec_sum": state["prec_sum"] + precs,
                "rec_sum": state["rec_sum"] + recs,
                "n_img": state["n_img"] + B}

    def compute(self, state, verbose=False):
        tp = np.asarray(state["tp"], np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            prec = tp / np.asarray(state["pred_pos"], np.float64)
            rec = tp / np.asarray(state["act_pos"], np.float64)
            num = (1 + self.beta_squared) * prec * rec
            den = self.beta_squared * prec + rec
            f = num / den
        f = np.nan_to_num(f, nan=0.0)
        n = max(float(state["n_img"]), 1.0)
        mprec = np.asarray(state["prec_sum"], np.float64) / n
        mrec = np.asarray(state["rec_sum"], np.float64) / n
        fs = 2 * mprec * mrec / (mprec + mrec + 1e-12)
        mious = np.asarray(state["jac_sum"], np.float64) / n
        return {"Beta maxF": float(f.max()),
                "maxF": float(fs.max()),
                "mIoU": float(mious.max())}


class DepthMeter(MeterBase):
    def init(self):
        z = jnp.zeros((), jnp.float32)
        return {"sq": z, "log_sq": z, "n": z}

    def update(self, state, pred, gt, weight=None):
        gt = _row_ignore(_squeeze_label(gt).astype(jnp.float32),
                         weight, 255.0)
        pred = pred.astype(jnp.float32)
        mask = gt != 255.0
        pred = jnp.maximum(pred, 1e-9)
        safe_gt = jnp.where(mask, gt, 1.0)
        sq = jnp.where(mask, (gt - pred) ** 2, 0.0).sum()
        lsq = jnp.where(mask, (jnp.log(safe_gt) - jnp.log(pred)) ** 2,
                        0.0).sum()
        return {"sq": state["sq"] + sq, "log_sq": state["log_sq"] + lsq,
                "n": state["n"] + mask.sum().astype(jnp.float32)}

    def compute(self, state, verbose=False):
        n = max(float(state["n"]), 1.0)
        return {"rmse": float(np.sqrt(float(state["sq"]) / n)),
                "log_rmse": float(np.sqrt(float(state["log_sq"]) / n))}


class EdgeMeter(MeterBase):
    def __init__(self, pos_weight: float = 0.95):
        self.pos_weight = pos_weight

    def init(self):
        z = jnp.zeros((), jnp.float32)
        return {"loss": z, "n": z}

    def update(self, state, pred, gt, weight=None):
        gt = _squeeze_label(gt).astype(jnp.float32)
        p = pred.astype(jnp.float32) / 255.0  # probabilities-as-logits quirk
        loss = balanced_bce_logits(p, gt, pos_weight=self.pos_weight,
                                   row_weight=weight)
        if weight is None:
            numel = gt.size
        else:
            numel = weight.astype(jnp.float32).sum() * (gt.size
                                                        // gt.shape[0])
        return {"loss": state["loss"] + numel * loss,
                "n": state["n"] + numel}

    def compute(self, state, verbose=False):
        return {"loss": float(state["loss"]) / max(float(state["n"]), 1.0)}


def get_single_task_meter(task: str, database: str = "PASCALContext",
                          edge_pos_weight: float = 0.95) -> MeterBase:
    """Meter dispatch (evaluate_utils.py:96-126)."""
    if task == "semseg":
        return SemsegMeter(database)
    if task == "human_parts":
        return HumanPartsMeter(database)
    if task == "normals":
        return NormalsMeter()
    if task == "sal":
        return SaliencyMeter()
    if task == "depth":
        return DepthMeter()
    if task == "edge":
        return EdgeMeter(pos_weight=edge_pos_weight)
    raise NotImplementedError(task)


class PerformanceMeter:
    """Multi-task wrapper (evaluate_utils.py:41-63) with device-side
    update and cross-host reduction support."""

    def __init__(self, tasks, database: str = "PASCALContext"):
        self.tasks = list(tasks)
        self.meters = {t: get_single_task_meter(t, database)
                       for t in self.tasks}
        self.states = {t: self.meters[t].init() for t in self.tasks}

    def reset(self):
        self.states = {t: self.meters[t].init() for t in self.tasks}

    def update(self, preds: Dict, targets: Dict, processed: bool = False,
               weight=None):
        """preds: raw NHWC logits (or get_output results if processed)."""
        for t in self.tasks:
            p = preds[t] if processed else get_output(preds[t], t)
            self.states[t] = self.meters[t].update(self.states[t], p,
                                                   targets[t], weight)

    def update_jit(self, states, preds, targets, weight=None):
        """Pure functional update for use inside jit. ``weight``:
        optional per-sample [B] 0/1 validity mask (SPMD padding of the
        ragged final global batch contributes exactly nothing)."""
        return {t: self.meters[t].update(states[t],
                                         get_output(preds[t], t),
                                         targets[t], weight)
                for t in self.tasks}

    def get_score(self, verbose: bool = True) -> Dict:
        scores = {t: self.meters[t].compute(self.states[t])
                  for t in self.tasks}
        if verbose:
            for t, s in scores.items():
                msg = ", ".join(f"{k}: {v:.4f}" for k, v in s.items()
                                if isinstance(v, float))
                print(f"[{t}] {msg}")
        return scores


def calculate_multi_task_performance(eval_dict: Dict,
                                     single_task_dict: Dict) -> float:
    """MTL delta vs single-task baselines (evaluate_utils.py:66-93)."""
    assert set(eval_dict) == set(single_task_dict)
    total = 0.0
    for task in eval_dict:
        mtl, stl = eval_dict[task], single_task_dict[task]
        if task == "depth":
            total -= (mtl["rmse"] - stl["rmse"]) / stl["rmse"]
        elif task in ("semseg", "sal", "human_parts"):
            total += (mtl["mIoU"] - stl["mIoU"]) / stl["mIoU"]
        elif task == "normals":
            total -= (mtl["mean"] - stl["mean"]) / stl["mean"]
        elif task == "edge":
            total += (mtl["odsF"] - stl["odsF"]) / stl["odsF"]
        else:
            raise NotImplementedError(task)
    return total / len(eval_dict)
