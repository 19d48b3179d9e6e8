#!/usr/bin/env python
"""End-to-end pointing-game benchmark run (VERDICT round-2 item 5).

Drives the full torchray-parity benchmark stack — caffe-structure VGG16
(``explain/benchmark_models.py``), saliency methods, `run_pointing_benchmark`
(``torchray/benchmark/pointing_game.py:129-221`` semantics), and the sqlite
experiment store — on a synthetic VOC-like dataset (zero-egress environment:
no real VOC on disk, no published caffe weights to download).

Synthetic task: 20 classes; each image is background noise plus one colored
blob at a RANDOM position; the blob's color identifies the class and its
extent is the ground-truth mask. A briefly-trained model must localize the
discriminative evidence, so the pointing game measures real localization, not
chance. Writes docs/POINTING_GAME_r3.md (+ .json) and the sqlite store.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

NUM_CLASSES = 20


def make_synthetic_voc(n, seed, size=224, blob_r=30):
    """(images float32 [0,1] (N,H,W,3), labels, masks bool (N,H,W))."""
    rng = np.random.RandomState(seed)
    # 20 visually distinct colors: HSV-like wheel in RGB
    palette = np.stack([
        0.5 + 0.5 * np.cos(2 * np.pi * (np.arange(NUM_CLASSES) / NUM_CLASSES + sh))
        for sh in (0.0, 1 / 3, 2 / 3)
    ], axis=1).astype(np.float32)  # (20, 3)
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32)
    images = rng.rand(n, size, size, 3).astype(np.float32) * 0.35
    labels = rng.randint(0, NUM_CLASSES, n)
    masks = np.zeros((n, size, size), bool)
    for i in range(n):
        cy, cx = rng.randint(blob_r, size - blob_r, 2)
        d2 = (yy - cy) ** 2 + (xx - cx) ** 2
        blob = np.exp(-d2 / (2 * (blob_r / 2.0) ** 2))
        inside = d2 <= blob_r**2
        images[i] += blob[..., None] * palette[labels[i]]
        masks[i] = inside
    return np.clip(images, 0, 1), labels.astype(np.int32), masks


def main():
    ap = argparse.ArgumentParser()
    # default resnet50: the caffe VGG16's 134M fp32 params exceed the remote
    # TPU tunnel's compile-request size limit (HTTP 413) in this environment
    ap.add_argument("--arch", default="resnet50", choices=["vgg16", "resnet50"])
    ap.add_argument("--train_steps", type=int, default=300)
    ap.add_argument("--n_eval", type=int, default=50)
    ap.add_argument("--rise_masks", type=int, default=2000)
    ap.add_argument("--methods", default=None,
                    help="comma list; default = every method in the grid")
    ap.add_argument("--append", action="store_true",
                    help="merge results into an existing report/store instead "
                         "of starting fresh (same-named methods overwritten)")
    ap.add_argument("--out", default="docs/POINTING_GAME_r3.md")
    ap.add_argument("--store", default="docs/pointing_game_r3.sqlite")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from scouter_tpu.core import setup_compilation_cache

    setup_compilation_cache()

    from scouter_tpu.explain import backprop as bp
    from scouter_tpu.explain import cam as cam_mod
    from scouter_tpu.explain import excitation as ebp
    from scouter_tpu.explain.benchmark import ExperimentStore, run_pointing_benchmark
    from scouter_tpu.explain.benchmark_models import get_model
    from scouter_tpu.explain.extremal import extremal_perturbation
    from scouter_tpu.explain.rise import rise

    model, _ = get_model(args.arch, "voc")
    size = 224
    x0 = jnp.zeros((2, size, size, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x0)

    # --- brief training so saliency reflects learned evidence ---
    tr_x, tr_y, _ = make_synthetic_voc(512, seed=0, size=size)
    params = variables["params"]
    batch_stats = variables.get("batch_stats")
    tx = optax.adam(1e-4)
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, batch_stats, opt_state, xb, yb):
        def loss_fn(p):
            v = {"params": p}
            if batch_stats is not None:
                v["batch_stats"] = batch_stats
                logits, mut = model.apply(v, xb, train=True,
                                          mutable=["batch_stats"])
                new_stats = mut["batch_stats"]
            else:
                logits, new_stats = model.apply(v, xb), None
            logp = jax.nn.log_softmax(logits, axis=1)
            return -jnp.take_along_axis(logp, yb[:, None], axis=1).mean(), new_stats

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_stats, opt_state2, loss

    rng = np.random.RandomState(1)
    bs = 16
    t0 = time.time()
    for step in range(args.train_steps):
        sel = rng.randint(0, len(tr_x), bs)
        params, batch_stats, opt_state, loss = train_step(
            params, batch_stats, opt_state,
            jnp.asarray(tr_x[sel]), jnp.asarray(tr_y[sel]))
    train_wall = time.time() - t0
    variables = {"params": params}
    if batch_stats is not None:
        variables["batch_stats"] = batch_stats

    te_x, te_y, te_m = make_synthetic_voc(args.n_eval, seed=9, size=size)
    logits = np.asarray(model.apply(variables, jnp.asarray(te_x[:32])))
    test_acc = float((logits.argmax(1) == te_y[:32]).mean())
    print(f"trained {args.arch}: {args.train_steps} steps in {train_wall:.1f}s, "
          f"test acc {test_acc:.3f}", flush=True)

    def forward(images):
        return model.apply(variables, images)

    # --- saliency methods (image (H,W,C) float, class) -> (h,w) map ---
    grad_fn = jax.jit(lambda im, c: jnp.abs(jax.grad(
        lambda i: forward(i[None])[0, c])(im)).sum(-1))

    def gradient_saliency(image, c):
        return np.asarray(grad_fn(jnp.asarray(image, jnp.float32), c))

    def rise_saliency(image, c):
        # rise returns (num_classes, H, W)
        sal = rise(forward, jnp.asarray(image, jnp.float32)[None],
                   jax.random.PRNGKey(5), num_masks=args.rise_masks)
        return np.asarray(sal)[c]

    def extremal_saliency(image, c):
        masks, _ = extremal_perturbation(
            forward, jnp.asarray(image, jnp.float32)[None], int(c),
            areas=(0.05,), max_iter=400)
        return np.asarray(masks)[0, ..., 0] if np.asarray(masks).ndim == 4 \
            else np.asarray(masks)[0]

    # torchray's reference benchmark grid ("center" chance baseline + the
    # backprop/CAM families + the perturbation methods). The layer-targeted
    # methods (grad_cam at the last conv, EBP at layer3, contrastive EBP
    # layer2/4) use the reference's resnet50 placements.
    size_center = np.zeros((size, size), np.float32)
    size_center[size // 2, size // 2] = 1.0

    def method_on_image(fn, **kw):
        def run(image, c):
            out = fn(model, variables, jnp.asarray(image, jnp.float32)[None],
                     int(c), **kw)
            return np.asarray(out)
        return run

    methods = {
        "center": lambda image, c: size_center,
        "gradient": gradient_saliency,
        "deconvnet": method_on_image(bp.deconvnet),
        "guided_backprop": method_on_image(bp.guided_backprop),
        "grad_cam": method_on_image(cam_mod.gradcam),
        "excitation_backprop": method_on_image(
            ebp.excitation_backprop, saliency_layer="layer3"),
        "contrastive_excitation_backprop": method_on_image(
            ebp.contrastive_excitation_backprop),
        "rise": rise_saliency,
        "extremal_perturbation": extremal_saliency,
    }
    if args.methods:
        wanted = args.methods.split(",")
        unknown = [m for m in wanted if m not in methods]
        assert not unknown, f"unknown methods: {unknown} (have {list(methods)})"
        methods = {m: methods[m] for m in wanted}

    prior_rows = {}
    json_path = os.path.splitext(args.out)[0] + ".json"
    if args.append and os.path.exists(json_path):
        with open(json_path) as f:
            prior = json.load(f)
        prior_rows = {r[0]: r for r in prior.get("rows", [])}
        test_acc = prior.get("test_acc", test_acc)

    os.makedirs(os.path.dirname(args.store) or ".", exist_ok=True)
    if os.path.exists(args.store) and not args.append:
        os.unlink(args.store)
    store = ExperimentStore(args.store)
    rows = []
    for name, fn in methods.items():
        dataset = ((te_x[i], int(te_y[i]), te_m[i]) for i in range(args.n_eval))
        t0 = time.time()
        game = run_pointing_benchmark(
            fn, dataset, NUM_CLASSES, tolerance=15, store=store,
            series=f"{args.arch}_synthetic_voc", experiment=name)
        wall = time.time() - t0
        rows.append((name, float(game.accuracy), int(game.hits.sum()),
                     int(game.hits.sum() + game.misses.sum()), round(wall, 1)))
        print(f"{name}: pointing acc {game.accuracy:.3f} ({wall:.1f}s)", flush=True)
    store.close()

    if prior_rows:
        new_names = {r[0] for r in rows}
        rows = [r for r in prior_rows.values() if r[0] not in new_names] + rows
    order = ["center", "gradient", "deconvnet", "guided_backprop", "grad_cam",
             "excitation_backprop", "contrastive_excitation_backprop", "rise",
             "extremal_perturbation"]
    rows.sort(key=lambda r: order.index(r[0]) if r[0] in order else len(order))

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        f.write("# Pointing-game benchmark report (round 3, SYNTHETIC VOC)\n\n")
        f.write(f"Model: caffe-structure {args.arch} "
                f"(explain/benchmark_models.py), trained {args.train_steps} "
                f"steps on the synthetic 20-class blob task "
                f"(test acc {test_acc:.3f}); {args.n_eval} eval images; "
                f"tolerance 15 (pointing_game.py:35-127 semantics); results "
                f"persisted to the sqlite experiment store "
                f"(`{os.path.basename(args.store)}`).\n\n")
        f.write("| method | pointing acc | hits | n | wall (s) |\n|---|---|---|---|---|\n")
        for name, acc, hits, n, wall in rows:
            f.write(f"| {name} | {acc:.3f} | {hits} | {n} | {wall} |\n")
        f.write("\nNo real VOC/COCO or published caffe weights are reachable "
                "in this environment; the harness, models, store and metric "
                "are the real ones — only the images are synthetic.\n")
    with open(os.path.splitext(args.out)[0] + ".json", "w") as f:
        json.dump({"arch": args.arch, "test_acc": test_acc,
                   "rows": rows}, f, indent=2)
    print(open(args.out).read())


if __name__ == "__main__":
    main()
