"""Aggregate the profile_step.py opstats dump into named step buckets."""

import glob
import json
import re
import sys
from collections import defaultdict


def classify(op, typ):
    if "decoder_" in op or "tmc,tco->tmo" in op or "tmc,tcn->tmn" in op:
        return "decoder heads"
    if "downsample" in op or "tmo/dot_general" in op and "downsampler" in op:
        return "patchmerge+downsampler"
    if "attn/pallas_call" in op:
        return "attn kernel"
    if "mlp/pallas_call" in op or "mlp/fc2/pallas_call" in op:
        return "mlp kernels"
    if "_ln_fused/pallas_call" in op:
        return "ln+qkv/fc1 kernels"
    if "pallas_call" in op:
        return "other pallas"
    if typ in ("reshape", "transpose", "copy", "gather", "concatenate",
               "dynamic_slice", "slice", "dynamic-update-slice", "pad",
               "scatter", "select_n" ) and ("attn" in op or "blocks" in op
                                            or "window" in op):
        return "layout (blocks)"
    if typ in ("reshape", "transpose", "copy", "gather", "concatenate",
               "slice", "pad"):
        return "layout (other)"
    if typ == "dot_general":
        if "_ln_fused" in op or "fc1" in op or "fc2" in op or "mlp" in op:
            return "mlp GEMMs"
        if "attn" in op or "qkv" in op or "proj" in op:
            return "attn GEMMs"
        if "trm,tro" in op or "tro->" in op or "trm" in op:
            return "task expansion"
        if "_resize" in op:
            return "resize GEMMs"
        return "other GEMMs"
    if typ in ("add", "subtract", "multiply", "divide", "select_n",
               "convert_element_type", "tanh", "exponential", "erf",
               "maximum", "rsqrt", "negate", "compare", "and", "or"):
        return "elementwise"
    if typ in ("reduce_sum", "reduce", "reduce_max", "reduce_window_sum",
               "argmax", "reduce_min"):
        return "reductions"
    if typ in ("convolution",):
        return "convs"
    return f"misc:{typ}"


def main():
    f = sorted(glob.glob(
        "/tmp/mtlora_trace/plugins/profile/*/vm.xplane.pb.opstats.json"))[-1]
    tabs = json.load(open(f))
    tab = tabs[0]
    cols = [c["id"] for c in tab["cols"]]
    buckets = defaultdict(float)
    details = defaultdict(list)
    total = 0.0
    occ_div = None
    for r in tab["rows"]:
        row = dict(zip(cols, [c["v"] if isinstance(c, dict) else c
                              for c in r["c"]]))
        if row["host_or_device"] != "Device":
            continue
        t = float(row["total_self_time"]) / 1000.0  # ms
        n = float(row["occurrences"]) or 1
        if occ_div is None:
            occ_div = n  # top op ran `iters` times; normalize per step
        t /= occ_div
        b = classify(row["operation"], row["type"])
        buckets[b] += t
        details[b].append((t, row["operation"]))
        total += t
    for b, t in sorted(buckets.items(), key=lambda kv: -kv[1]):
        print(f"{b:26s} {t:7.2f} ms")
        if "-v" in sys.argv:
            for tt, op in sorted(details[b], reverse=True)[:6]:
                print(f"    {tt:6.2f}  {op[-110:]}")
    print(f"{'TOTAL (device self)':26s} {total:7.2f} ms")


if __name__ == "__main__":
    main()
