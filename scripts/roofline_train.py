#!/usr/bin/env python
"""Bytes-per-step roofline for the train step (round-4 VERDICT #1).

Builds the flagship train step, walks its FORWARD jaxpr for every
``conv_general_dilated`` / ``dot_general``, and prices a LOWER BOUND on
HBM traffic per optimizer step under generous fusion assumptions:

  per conv/dot with activation input A, weight W, output Z (bytes a,w,z):
    forward      : read a + w, write z
    backward dx  : read z (dZ) + w,  write a (dA)   [skipped for layer 0]
    backward dw  : read a + z (dZ),  write w (dW)
  BN / ReLU / pool / residual adds: assumed perfectly fused -> 0 bytes
  (this is what makes it a lower bound; XLA materializes some of them)
  optimizer    : fp32 Adam = 7 x 4B per param (read p,m,v,g; write p,m,v)
                 + bf16 cast write of the updated params

The bound deliberately undercounts (single dZ read impossible to avoid
twice in the standard 2-conv backward is COUNTED twice — that part is
real — but every elementwise pass is free). ``measured_ms <= 1.2 x
lb_ms`` means the step is within 20% of its memory-bound speed of light
and further MFU chasing is roofline-futile (the VERDICT #1 close-out
criterion).

Usage:
  python scripts/roofline_train.py --model_type resnet18 [--cpu]
  python scripts/roofline_train.py --model_type mobilenetv3 \
      --measured_ms 16.62
  # on TPU, add --cost_analysis for XLA's own bytes-accessed figure
"""

import argparse
import functools
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

HBM_GBPS = 820.0  # v5e HBM bandwidth


def walk_jaxpr(jaxpr, hits):
    """Recursively collect (primitive, invars_avals, outvar_aval) for conv
    and dot eqns, including nested call/custom-vjp/scan jaxprs."""
    for eqn in jaxpr.eqns:
        if eqn.primitive.name in ("conv_general_dilated", "dot_general"):
            hits.append((eqn.primitive.name,
                         [v.aval for v in eqn.invars],
                         eqn.outvars[0].aval))
        for param in eqn.params.values():
            import jax

            if isinstance(param, jax.extend.core.ClosedJaxpr):
                walk_jaxpr(param.jaxpr, hits)
            elif hasattr(param, "eqns"):  # raw Jaxpr
                walk_jaxpr(param, hits)
            elif isinstance(param, (tuple, list)):
                for p in param:
                    if isinstance(p, jax.extend.core.ClosedJaxpr):
                        walk_jaxpr(p.jaxpr, hits)
                    elif hasattr(p, "eqns"):
                        walk_jaxpr(p, hits)


def nbytes(aval):
    import numpy as np

    return int(np.prod(aval.shape)) * aval.dtype.itemsize


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_type", default="resnet18")
    ap.add_argument("--variant", default="texture_nfp")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--img", type=int, default=224)
    ap.add_argument("--num_classes", type=int, default=21)
    ap.add_argument("--fp32", action="store_true",
                    help="price the fp32 step (default bf16 production)")
    ap.add_argument("--fwd", action="store_true",
                    help="price the INFERENCE forward only (read A+W, "
                         "write Z per conv/dot; no backward, no Adam) — "
                         "the serving-path bound")
    ap.add_argument("--measured_ms", type=float, default=None,
                    help="measured ms/step (bench_train) to compare; "
                         "omit to print the bound alone")
    ap.add_argument("--cost_analysis", action="store_true",
                    help="also compile the FULL train step on the current "
                         "backend and report XLA's cost analysis "
                         "(bytes accessed / flops) — one compile")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default=os.path.join(REPO,
                                                  "roofline_train.jsonl"))
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from neighbour_feature_pooling_tpu.models import get_model
    from neighbour_feature_pooling_tpu.train import create_train_state
    from neighbour_feature_pooling_tpu.train.engine import train_step_body

    dtype = jnp.float32 if args.fp32 else jnp.bfloat16
    kw = {"stem_s2d": True} if args.model_type.startswith("resnet") else {}
    model = get_model(args.model_type, args.variant, args.num_classes,
                      dtype=dtype, **kw)
    x = jnp.zeros((args.batch, args.img, args.img, 3), jnp.float32)

    def fwd(variables, x):
        out, _ = model.apply(variables, x, train=True,
                             rngs={"dropout": jax.random.PRNGKey(0)},
                             mutable=["batch_stats"])
        return out

    variables = jax.eval_shape(
        lambda: model.init({"params": jax.random.PRNGKey(0)}, x[:1],
                           train=False))
    jaxpr = jax.make_jaxpr(fwd)(variables, x)
    hits = []
    walk_jaxpr(jaxpr.jaxpr, hits)

    rows = []
    total = 0
    for i, (prim, ins, out) in enumerate(hits):
        # activation operand = the one sharing the batch dim size /
        # larger-rank heuristic: conv lhs is in[0], dot lhs is in[0]
        a = nbytes(ins[0])
        w = nbytes(ins[1]) if len(ins) > 1 else 0
        z = nbytes(out)
        fwd_b = a + w + z
        dx_b = 0 if i == 0 else (z + w + a)      # read dZ+W, write dA
        dw_b = a + z + w                         # read A+dZ, write dW
        b = fwd_b if args.fwd else (fwd_b + dx_b + dw_b)
        total += b
        rows.append({"op": prim, "in": list(ins[0].shape),
                     "w": (list(ins[1].shape) if len(ins) > 1 else []),
                     "out": list(out.shape), "mbytes": round(b / 1e6, 1)})

    n_params = sum(
        int(np.prod(l.shape)) for l in jax.tree_util.tree_leaves(
            variables["params"]))
    adam_b = (0 if args.fwd else
              7 * 4 * n_params + 2 * jnp.dtype(dtype).itemsize * n_params)
    total += adam_b

    lb_ms = total / (HBM_GBPS * 1e9) * 1000.0
    rec = {
        "model": f"{args.model_type}+{args.variant}",
        "pass": "fwd" if args.fwd else "train",
        "batch": args.batch, "img": args.img,
        "dtype": "fp32" if args.fp32 else "bf16",
        "n_conv_dot": len(hits),
        "n_params": n_params,
        "traffic_lb_mb": round(total / 1e6, 1),
        "adam_mb": round(adam_b / 1e6, 1),
        "lb_ms_at_820GBps": round(lb_ms, 2),
    }
    if args.measured_ms is not None:
        rec["measured_ms"] = args.measured_ms
        rec["measured_over_lb"] = round(args.measured_ms / lb_ms, 2)
        rec["achieved_GBps_vs_lb_traffic"] = round(
            total / (args.measured_ms / 1000.0) / 1e9, 1)

    if args.cost_analysis:
        batch = {"image": x,
                 "label": jnp.zeros((args.batch,), jnp.int32),
                 "weight": jnp.ones((args.batch,), jnp.float32)}
        state = create_train_state(model, jax.random.PRNGKey(0), batch,
                                   1e-4)
        step = jax.jit(functools.partial(train_step_body,
                                         num_classes=args.num_classes),
                       static_argnames=("frozen",))
        compiled = step.lower(state, batch, jax.random.PRNGKey(1),
                              frozen=False).compile()
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        if ca:
            by = ca.get("bytes accessed")
            fl = ca.get("flops")
            if by:
                rec["xla_bytes_accessed_mb"] = round(by / 1e6, 1)
                rec["xla_bytes_over_lb"] = round(by / total, 2)
            if fl:
                rec["xla_gflops_per_step"] = round(fl / 1e9, 1)

    print(json.dumps(rec))
    # per-op detail on stderr for inspection
    for r in sorted(rows, key=lambda r: -r["mbytes"])[:12]:
        print(f"#  {r['mbytes']:9.1f} MB  {r['op']:22s} in={r['in']} "
              f"w={r['w']}", file=sys.stderr)
    with open(args.out, "a") as f:
        f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
