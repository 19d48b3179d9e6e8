"""Cross-framework explanation-parity harness: heatmap IoU + top-1 deltas.

Measures the north-star contract's unmeasured half (BASELINE.json: "top-1
accuracy and attention-map IoU parity"): starting from IDENTICAL weights, train
the torch reference SlotModel (imported from /root/reference) and this
framework side by side on the SAME batch stream, then push probe images through
both sides' test.py flows —

- torch side: the reference's own vis path (``sloter/utils/slot_attention.py:
  68-85`` writes slot_{id}.png during forward; ``test.py:33-38`` resizes them
  bilinear to the raw image size),
- our side: ``explain.vis.attention_to_maps`` + the same resize,

and report per-class heatmap IoU (binary @64/128/192 + soft) and top-1
prediction agreement.

Data: synthetic gaussian stream by default (the environment has no datasets on
disk — every number printed is then labeled SYNTHETIC), or point --data_dir at
a real MNIST/ConText/ImageNet directory to run the identical harness on real
images.

Usage:
    python examples/parity_report.py                       # quick synthetic run
    python examples/parity_report.py --steps 30 --probes 8
    python examples/parity_report.py --dataset MNIST --data_dir /path/to/mnist
    python examples/parity_report.py --mode full-recipe    # 3-stage README chain
    python examples/parity_report.py --mode chaos-control  # fp32 Lyapunov floor
    python examples/parity_report.py --mode negative-convergence --epochs 20

Needs the reference checkout at /root/reference (uses the dependency stubs in
tests/test_models.py). This is a development/verification tool, not part of the
installable framework; the pure metric functions live in
``scouter_tpu.explain.parity``.
"""

from __future__ import annotations

import argparse
import contextlib
import json
import os
import sys
import tempfile

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tests"))

# Parity runs compare fp32 math against torch CPU: force the CPU backend and
# true-fp32 matmuls (the TPU backend would run matmuls in bf16 and the
# comparison would measure precision, not correctness). The within-jax modes
# (jax-chaos-control / plateau-sweep --framework jax) accept --platform tpu;
# honoring it requires NOT pinning the env var before jax import.
if not any(a == "--platform=tpu" or (a == "tpu" and "--platform" in sys.argv)
           for a in sys.argv):
    os.environ.setdefault("JAX_PLATFORMS", "cpu")


@contextlib.contextmanager
def _chdir(path):
    old = os.getcwd()
    os.chdir(path)
    try:
        yield
    finally:
        os.chdir(old)


def make_batches(cfg, n_batches, seed, data_dir=None, split="train"):
    """(image NHWC float32 already-normalized, label) batches, identical for
    both frameworks. Synthetic unless data_dir points at a real dataset."""
    rng = np.random.RandomState(seed)
    if data_dir is None:
        return [
            (
                rng.randn(cfg.batch_size, cfg.img_size, cfg.img_size, 3).astype(np.float32),
                rng.randint(0, cfg.num_classes, cfg.batch_size),
            )
            for _ in range(n_batches)
        ], True
    # real data: reuse the framework loader, feed the SAME post-transform
    # arrays to both frameworks
    import dataclasses

    from scouter_tpu.data import select_dataset
    from scouter_tpu.data.transforms import preprocess_batch
    import jax.numpy as jnp

    cfg = dataclasses.replace(cfg, dataset_dir=data_dir)
    ds = select_dataset(cfg, train=(split == "train"))
    if len(ds) == 0:
        raise SystemExit(
            f"--data_dir {data_dir!r} yielded an empty {cfg.dataset} {split} "
            f"split — check the directory layout"
        )
    needed = n_batches * cfg.batch_size
    if len(ds) < needed:
        raise SystemExit(
            f"--data_dir {data_dir!r}: the {cfg.dataset} {split} split has "
            f"{len(ds)} items but the run needs {needed} "
            f"(= {n_batches} batches x batch_size {cfg.batch_size}); "
            f"reduce --steps/--val_batches/--batch_size")
    idx = rng.permutation(len(ds))
    batches = []
    for b in range(n_batches):
        sel = idx[b * cfg.batch_size:(b + 1) * cfg.batch_size]
        imgs = np.stack([np.asarray(ds.images[i]) for i in sel])
        labels = np.asarray([int(ds.labels[i]) for i in sel])
        x = np.asarray(preprocess_batch(jnp.asarray(imgs), dataset=cfg.dataset,
                                        img_size=cfg.img_size))
        batches.append((x.astype(np.float32), labels))
    return batches, False


def _torch_probe_maps(ref, probe_imgs, cfg):
    """Per-probe per-class heatmaps via the reference's OWN vis flow
    (slot_attention.py:68-85 PNG side effects, test.py:33-38 bilinear
    resize). Returns ``[probe][class]`` uint8-scale fp arrays at img_size."""
    import torch

    from scouter_tpu.explain.parity import resize_map_bilinear

    out_size = (cfg.img_size, cfg.img_size)
    all_maps = []
    for p in range(len(probe_imgs)):
        x1 = probe_imgs[p:p + 1]
        ref.slot.vis, ref.slot.vis_id = True, 0
        with tempfile.TemporaryDirectory() as td, _chdir(td):
            os.makedirs("sloter/vis", exist_ok=True)
            with torch.no_grad(), contextlib.redirect_stdout(open(os.devnull, "w")):
                ref(torch.from_numpy(x1.transpose(0, 3, 1, 2)))
            from PIL import Image
            all_maps.append([
                resize_map_bilinear(
                    np.array(Image.open(f"sloter/vis/slot_{c}.png"), np.uint8),
                    out_size,
                )
                for c in range(cfg.num_classes)
            ])
        ref.slot.vis = False
    return all_maps


def _jax_probe_maps(model, variables, probe_imgs, cfg):
    """Per-probe per-class heatmaps from this framework's forward attention,
    rendered host-side (the test.py-equivalent flow)."""
    import jax.numpy as jnp

    from scouter_tpu.explain.parity import resize_map_bilinear
    from scouter_tpu.explain.vis import attention_to_maps

    out_size = (cfg.img_size, cfg.img_size)
    all_maps = []
    for p in range(len(probe_imgs)):
        out = model.apply(variables, jnp.asarray(probe_imgs[p:p + 1]))
        maps = attention_to_maps(np.asarray(out["attn"])[0],
                                 cfg.num_classes, cfg.slots_per_class)
        all_maps.append([resize_map_bilinear(m, out_size) for m in maps])
    return all_maps


def _pair_iou(maps_a, maps_b, num_classes):
    """Aggregate IoU between two ``[probe][class]`` map stacks through the
    SAME pipeline as the cross-framework comparison."""
    from scouter_tpu.explain.parity import iou_table

    return _aggregate_iou(
        [iou_table(a, b) for a, b in zip(maps_a, maps_b)], num_classes)


def _heatmap_reports(ref, model, variables, probe_imgs, cfg):
    """Per-probe heatmap-IoU tables comparing both test.py flows.

    torch side: the reference's own vis path (slot_attention.py:68-85 PNG
    side effects, test.py:33-38 bilinear resize); ours: attention returned
    from forward, rendered host-side.
    """
    from scouter_tpu.explain.parity import iou_table

    ref_maps = _torch_probe_maps(ref, probe_imgs, cfg)
    our_maps = _jax_probe_maps(model, variables, probe_imgs, cfg)
    return [iou_table(a, b) for a, b in zip(ref_maps, our_maps)]


def _aggregate_iou(reports, num_classes):
    mean_keys = reports[0]["mean"].keys()
    return {
        "per_class": [
            {
                "class": c,
                **{
                    k: float(np.mean([r["per_class"][c][k] for r in reports]))
                    for k in mean_keys
                },
            }
            for c in range(num_classes)
        ],
        "mean": {
            k: float(np.mean([r["mean"][k] for r in reports])) for k in mean_keys
        },
    }


def run_parity(cfg, steps=8, probes=4, val_batches=2, seed=0, lr=1e-4,
               data_dir=None, out_dir=None):
    import torch
    import jax
    import jax.numpy as jnp

    # (the TPU plugin may force jax_platforms at import; the update wins)
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")

    from scouter_tpu.explain.parity import format_iou_table
    from scouter_tpu.models import build_slot_model, torch_state_dict_to_variables
    from scouter_tpu.train.state import create_train_state
    from scouter_tpu.train.steps import make_train_step

    from test_models import install_reference_stubs  # tests/ on sys.path
    from test_slot_model import _make_ref_slot_model

    install_reference_stubs()

    if probes < 1 or val_batches < 1 or steps < 1:
        raise SystemExit("--steps, --probes and --val_batches must all be >= 1")
    train_batches, synthetic = make_batches(cfg, steps, seed, data_dir, "train")
    val_data, _ = make_batches(cfg, val_batches, seed + 1, data_dir, "val")
    probe_imgs = np.concatenate([b[0] for b in val_data])[:probes]

    # ---- identical initial weights
    torch.manual_seed(seed)
    ref = _make_ref_slot_model(cfg)
    variables = torch_state_dict_to_variables(
        {k: v.clone() for k, v in ref.state_dict().items()}
    )

    # ---- torch reference training (AdamW as train.py:146-148)
    ref.train()
    opt = torch.optim.AdamW(ref.parameters(), lr=lr)
    torch_losses = []
    for x, y in train_batches:
        opt.zero_grad()
        _, loss_list = ref(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                           torch.from_numpy(np.asarray(y)))
        loss_list[0].backward()
        opt.step()
        torch_losses.append(float(loss_list[0].detach()))

    # ---- framework training, same stream
    model = build_slot_model(cfg)
    state, tx = create_train_state(variables, lr)
    step = make_train_step(model, tx, cfg.lambda_value, donate=False)
    jax_losses = []
    for x, y in train_batches:
        state, metrics = step(state, {"image": jnp.asarray(x), "label": jnp.asarray(y)})
        jax_losses.append(float(metrics["loss"]))

    # ---- top-1 comparison on val stream
    ref.eval()
    agree = total = 0
    ref_correct = jax_correct = 0
    for x, y in val_data:
        with torch.no_grad():
            ref_pred = ref(torch.from_numpy(x.transpose(0, 3, 1, 2))).argmax(1).numpy()
        out = model.apply(state.variables(), jnp.asarray(x))
        jax_pred = np.asarray(out["logits"]).argmax(1)
        agree += int((ref_pred == jax_pred).sum())
        ref_correct += int((ref_pred == y).sum())
        jax_correct += int((jax_pred == y).sum())
        total += len(y)

    # ---- per-class slot maps via both test.py flows, probe-by-probe
    reports = _heatmap_reports(ref, model, state.variables(), probe_imgs, cfg)
    agg = _aggregate_iou(reports, cfg.num_classes)

    result = {
        "config": {
            "model": cfg.model, "dataset": cfg.dataset,
            "num_classes": cfg.num_classes, "slots_per_class": cfg.slots_per_class,
            "loss_status": cfg.loss_status, "img_size": cfg.img_size,
            "steps": steps, "probes": len(probe_imgs), "lr": lr,
        },
        "data": "SYNTHETIC (gaussian stream; no dataset on disk)" if synthetic
                else f"real ({data_dir})",
        "loss_trajectory": {
            "torch": torch_losses, "jax": jax_losses,
            "max_abs_delta": float(np.max(np.abs(np.array(torch_losses)
                                                 - np.array(jax_losses)))),
        },
        "top1": {
            "agreement": agree / total,
            "torch_acc": ref_correct / total,
            "jax_acc": jax_correct / total,
            "n": total,
        },
        "heatmap_iou": agg,
    }

    print(f"\n=== Explanation-parity report ({result['data']}) ===")
    print(f"model={cfg.model} classes={cfg.num_classes} spc={cfg.slots_per_class} "
          f"loss_status={cfg.loss_status} steps={steps}")
    print(f"loss trajectory max |Δ|: {result['loss_trajectory']['max_abs_delta']:.5f}")
    print(f"top-1 agreement: {agree}/{total} = {result['top1']['agreement']:.4f} "
          f"(torch acc {result['top1']['torch_acc']:.4f}, "
          f"jax acc {result['top1']['jax_acc']:.4f})")
    print("\nheatmap IoU (mean over probes):")
    print(format_iou_table(agg))

    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
        with open(os.path.join(out_dir, "parity_report.json"), "w") as f:
            json.dump(result, f, indent=2)
        print(f"\nwritten: {os.path.join(out_dir, 'parity_report.json')}")
    return result


def _epoch_indices(n, batch_size, seed, epoch):
    """Deterministic per-epoch shuffle, shared by both frameworks (the
    framework Loader's formula, data/pipeline.py:_epoch_indices)."""
    rng = np.random.RandomState((seed * 100003 + epoch) % (2**31))
    idx = np.arange(n)
    rng.shuffle(idx)
    n_full = (n // batch_size) * batch_size
    return idx[:n_full]


def _make_mnist_arrays(img_size, n_train, n_val, seed):
    """Synthetic MNIST resized+normalized once; both frameworks consume the
    same fp32 arrays so the comparison isolates training arithmetic."""
    import jax.numpy as jnp

    from scouter_tpu.data import synthetic_mnist
    from scouter_tpu.data.transforms import preprocess_batch

    (tr_x, tr_y), (te_x, te_y) = synthetic_mnist(n_train, n_val, seed)

    def prep(u8):
        out = []
        for i in range(0, len(u8), 64):
            out.append(np.asarray(preprocess_batch(
                jnp.asarray(u8[i:i + 64]), dataset="MNIST", img_size=img_size)))
        return np.concatenate(out).astype(np.float32)

    return (prep(tr_x), tr_y.astype(np.int64)), (prep(te_x), te_y.astype(np.int64))


def _torch_recipe(ref, train_arrays, val_arrays, epochs, batch_size, lr,
                  lr_drop, seed, on_epoch=None):
    """Train a reference model with the reference's loop semantics
    (engine.py:17-52 inner loop, train.py:146-148 AdamW, :179 StepLR).
    Returns per-epoch val accuracies. ``on_epoch(epoch)`` fires after each
    epoch's eval (the model is mutated in place — snapshot hooks read it)."""
    import torch

    x_tr, y_tr = train_arrays
    x_va, y_va = val_arrays
    opt = torch.optim.AdamW(ref.parameters(), lr=lr)
    sched = torch.optim.lr_scheduler.StepLR(opt, step_size=lr_drop)
    val_accs = []
    for epoch in range(epochs):
        ref.train()
        for s in range(0, len(idx := _epoch_indices(len(x_tr), batch_size, seed, epoch)),
                       batch_size):
            sel = idx[s:s + batch_size]
            opt.zero_grad()
            _, loss_list = ref(
                torch.from_numpy(x_tr[sel].transpose(0, 3, 1, 2)),
                torch.from_numpy(y_tr[sel]))
            loss_list[0].backward()
            opt.step()
        sched.step()
        ref.eval()
        correct = 0
        with torch.no_grad():
            for s in range(0, len(x_va), batch_size):
                out = ref(torch.from_numpy(x_va[s:s + batch_size].transpose(0, 3, 1, 2)))
                correct += int((out.argmax(1).numpy() == y_va[s:s + batch_size]).sum())
        val_accs.append(correct / len(x_va))
        if on_epoch is not None:
            on_epoch(epoch)
    return val_accs


def _jax_recipe(cfg, variables, train_arrays, val_arrays, epochs, batch_size,
                lr, seed, lr_drop=70, on_epoch=None):
    """Train this framework's model on the identical stream, mirroring the
    torch side's StepLR(step_size=lr_drop) per-epoch schedule (train.py:179 —
    it only fires past epoch 70, but long --epochs runs must keep the two
    recipes identical). Returns (final_state, per-epoch val accs, model).
    ``on_epoch(epoch, state)`` fires after each epoch's eval."""
    import jax.numpy as jnp

    from scouter_tpu.models import build_slot_model
    from scouter_tpu.train.state import create_train_state
    from scouter_tpu.train.steps import make_eval_step, make_train_step, set_learning_rate

    x_tr, y_tr = train_arrays
    x_va, y_va = val_arrays
    model = build_slot_model(cfg)
    state, tx = create_train_state(variables, lr)
    step = make_train_step(model, tx, cfg.lambda_value, donate=False)
    eval_step = make_eval_step(model, cfg.lambda_value)
    val_accs = []
    for epoch in range(epochs):
        state = set_learning_rate(state, lr * (0.1 ** (epoch // lr_drop)))
        for s in range(0, len(idx := _epoch_indices(len(x_tr), batch_size, seed, epoch)),
                       batch_size):
            sel = idx[s:s + batch_size]
            state, _ = step(state, {"image": jnp.asarray(x_tr[sel]),
                                    "label": jnp.asarray(y_tr[sel].astype(np.int32))})
        correct = total = 0
        for s in range(0, len(x_va), batch_size):
            xb, yb = x_va[s:s + batch_size], y_va[s:s + batch_size]
            m = eval_step(state, {"image": jnp.asarray(xb),
                                  "label": jnp.asarray(yb.astype(np.int32))})
            correct += float(m["acc"]) * len(yb)
            total += len(yb)
        val_accs.append(correct / total)
        if on_epoch is not None:
            on_epoch(epoch, state)
    return state, val_accs, model


def _final_agreement(ref, model, state, val_arrays, batch_size):
    import torch
    import jax.numpy as jnp

    x_va, y_va = val_arrays
    ref.eval()
    agree = ref_c = jax_c = total = 0
    for s in range(0, len(x_va), batch_size):
        xb, yb = x_va[s:s + batch_size], y_va[s:s + batch_size]
        with torch.no_grad():
            rp = ref(torch.from_numpy(xb.transpose(0, 3, 1, 2))).argmax(1).numpy()
        out = model.apply(state.variables(), jnp.asarray(xb))
        jp = np.asarray(out["logits"]).argmax(1)
        agree += int((rp == jp).sum())
        ref_c += int((rp == yb).sum())
        jax_c += int((jp == yb).sum())
        total += len(yb)
    return {"agreement": agree / total, "torch_acc": ref_c / total,
            "jax_acc": jax_c / total, "n": total}


def run_full_recipe(epochs=4, n_train=512, n_val=128, batch_size=8,
                    img_size=260, lr=1e-4, seed=0, probes=4, out_path=None):
    """Long-horizon cross-framework parity: train the torch reference
    END-TO-END beside this framework through the full MNIST recipe chain
    (README.md:84-105 — no_slot pretrain -> positive SCOUTER with the
    use_pre handoff -> negative SCOUTER), hundreds of optimizer steps per
    stage, from identical init per stage; compare per-epoch val accuracy,
    final top-1 agreement, and trained-model heatmap IoU.

    Both stage-2/3 models boot from the TORCH stage-1 checkpoint through each
    framework's own use_pre path (the reference's k[9:] strip runs verbatim on
    the torch side; our converter handles it on the jax side), so every stage
    is a clean identical-init comparison and drift does not compound across
    stages.
    """
    import torch
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")

    from scouter_tpu.core import ScouterConfig
    from scouter_tpu.models import (
        build_slot_model, strip_prefix, torch_state_dict_to_variables,
    )

    from test_models import install_reference_stubs
    from test_slot_model import _make_ref_slot_model

    install_reference_stubs()

    train_arrays, val_arrays = _make_mnist_arrays(img_size, n_train, n_val, seed)
    probe_imgs = val_arrays[0][:probes]
    base = dict(model="resnet18", dataset="MNIST", num_classes=10, channel=512,
                img_size=img_size, batch_size=batch_size,
                pre_trained=False, freeze_layers=0)
    lr_drop = 70  # train.py:34 default; never fires in a short schedule
    stages = []

    # ---- stage 1: no-slot pretrain (README.md:84-88), identical init
    cfg1 = ScouterConfig(**base, use_slot=False)
    torch.manual_seed(seed)
    ref1 = _make_ref_slot_model(cfg1)
    variables1 = torch_state_dict_to_variables(
        {k: v.clone() for k, v in ref1.state_dict().items()})
    t_accs1 = _torch_recipe(ref1, train_arrays, val_arrays, epochs, batch_size,
                            lr, lr_drop, seed)
    state1, j_accs1, model1 = _jax_recipe(cfg1, variables1, train_arrays,
                                          val_arrays, epochs, batch_size, lr, seed)
    agree1 = _final_agreement(ref1, model1, state1, val_arrays, batch_size)
    stages.append({"stage": "no_slot pretrain", "torch_val_acc": t_accs1,
                   "jax_val_acc": j_accs1, "final": agree1})

    # ---- write the torch stage-1 checkpoint where load_backbone expects it
    workdir = tempfile.mkdtemp(prefix="full_recipe_")
    os.makedirs(os.path.join(workdir, "saved_model"), exist_ok=True)
    torch.save({"model": ref1.state_dict()},
               os.path.join(workdir, "saved_model", "MNIST_no_slot_checkpoint.pth"))

    def _stage(cfg, stage_seed, name):
        # torch side: build with use_pre handoff running the reference's own
        # loader (slot_model.py:27-33) inside workdir
        torch.manual_seed(stage_seed)
        with _chdir(workdir):
            ref = _make_ref_slot_model(cfg)
        variables = torch_state_dict_to_variables(
            {k: v.clone() for k, v in ref.state_dict().items()})
        t_accs = _torch_recipe(ref, train_arrays, val_arrays, epochs,
                               batch_size, lr, lr_drop, stage_seed)
        state, j_accs, model = _jax_recipe(cfg, variables, train_arrays,
                                           val_arrays, epochs, batch_size, lr,
                                           stage_seed)
        final = _final_agreement(ref, model, state, val_arrays, batch_size)
        iou = _aggregate_iou(
            _heatmap_reports(ref, model, state.variables(), probe_imgs, cfg),
            cfg.num_classes)
        stages.append({"stage": name, "torch_val_acc": t_accs,
                       "jax_val_acc": j_accs, "final": final,
                       "heatmap_iou_mean": iou["mean"],
                       "heatmap_iou_per_class": iou["per_class"]})

    # ---- stage 2: positive SCOUTER with use_pre (README.md:91-97)
    _stage(ScouterConfig(**base, use_slot=True, use_pre=True, loss_status=1,
                         slots_per_class=1, power=1, to_k_layer=1,
                         lambda_value=1.0),
           seed + 1, "positive SCOUTER (use_pre)")

    # ---- stage 3: negative SCOUTER, from-scratch backbone (README.md:99-105)
    _stage(ScouterConfig(**base, use_slot=True, use_pre=False, loss_status=-1,
                         slots_per_class=2, power=2, to_k_layer=1,
                         lambda_value=1.5),
           seed + 2, "negative SCOUTER")

    result = {
        "data": f"SYNTHETIC MNIST ({n_train} train / {n_val} val, "
                f"{img_size}px, {epochs} epochs, bs={batch_size}, "
                f"{epochs * (n_train // batch_size)} steps/stage)",
        "stages": stages,
    }
    lines = ["# Full-recipe cross-framework parity (torch reference vs scouter-tpu)",
             "", result["data"], ""]
    for st in stages:
        lines += [f"## {st['stage']}", "",
                  "| epoch | torch val acc | jax val acc | delta (pt) |",
                  "|---|---|---|---|"]
        for e, (t, j) in enumerate(zip(st["torch_val_acc"], st["jax_val_acc"])):
            lines.append(f"| {e + 1} | {t:.4f} | {j:.4f} | {100 * (j - t):+.2f} |")
        f = st["final"]
        lines += ["", f"final: top-1 agreement {f['agreement']:.4f} "
                      f"(torch {f['torch_acc']:.4f}, jax {f['jax_acc']:.4f}, "
                      f"n={f['n']})"]
        if "heatmap_iou_mean" in st:
            m = st["heatmap_iou_mean"]
            lines.append(f"trained-model heatmap IoU (mean over {probes} probes): "
                         f"soft {m['soft_iou']:.4f}, @128 {m['iou@128']:.4f}")
        lines.append("")
    report = "\n".join(lines)
    print(report)
    if out_path:
        with open(out_path, "w") as fh:
            fh.write(report + "\n")
        with open(os.path.splitext(out_path)[0] + ".json", "w") as fh:
            json.dump(result, fh, indent=2)
        print(f"written: {out_path}")
    return result


def _torch_agreement(ref_a, ref_b, val_arrays, batch_size):
    """Top-1 agreement between two torch reference models (the torch-vs-torch
    analogue of _final_agreement)."""
    import torch

    x_va, y_va = val_arrays
    ref_a.eval()
    ref_b.eval()
    agree = a_c = b_c = total = 0
    with torch.no_grad():
        for s in range(0, len(x_va), batch_size):
            xb = torch.from_numpy(x_va[s:s + batch_size].transpose(0, 3, 1, 2))
            yb = y_va[s:s + batch_size]
            pa = ref_a(xb).argmax(1).numpy()
            pb = ref_b(xb).argmax(1).numpy()
            agree += int((pa == pb).sum())
            a_c += int((pa == yb).sum())
            b_c += int((pb == yb).sum())
            total += len(yb)
    return {"agreement": agree / total, "acc_a": a_c / total,
            "acc_b": b_c / total, "n": total}


def run_chaos_control(epochs=4, n_train=512, n_val=128, batch_size=8,
                      img_size=260, lr=1e-4, seed=0, eps=1e-6, out_path=None,
                      loss_status=-1):
    """Lyapunov control for the full-recipe parity numbers: train the TORCH
    reference negative-SCOUTER recipe (the same from-scratch stage 3 as
    run_full_recipe, README.md:99-105) TWICE, from inits that differ by a
    single eps added to one conv1 weight element, with everything else —
    batch stream, order, optimizer, thread count — identical.

    If torch-vs-torch(eps) shows the same per-epoch val-accuracy scatter and
    final top-1 disagreement as torch-vs-jax did at the same horizon, then the
    cross-framework deltas are at the floor set by fp32 chaos in the slot
    renorm (sloter/utils/slot_attention.py:56-60 — sigmoid saturation + the
    dots/row_sum*total renorm amplify ulp-scale differences), not by a
    framework divergence.
    """
    import torch

    import jax

    jax.config.update("jax_platforms", "cpu")

    from scouter_tpu.core import ScouterConfig

    from test_models import install_reference_stubs
    from test_slot_model import _make_ref_slot_model

    install_reference_stubs()
    train_arrays, val_arrays = _make_mnist_arrays(img_size, n_train, n_val, seed)
    spc, power, lam = (2, 2, 1.5) if loss_status == -1 else (1, 1, 1.0)
    cfg = ScouterConfig(model="resnet18", dataset="MNIST", num_classes=10,
                        channel=512, img_size=img_size, batch_size=batch_size,
                        pre_trained=False, freeze_layers=0, use_slot=True,
                        use_pre=False, loss_status=loss_status,
                        slots_per_class=spc, power=power, to_k_layer=1,
                        lambda_value=lam)
    stage_seed = seed + 2  # the same seed stage 3 used in run_full_recipe
    torch.manual_seed(stage_seed)
    ref_a = _make_ref_slot_model(cfg)
    torch.manual_seed(stage_seed)
    ref_b = _make_ref_slot_model(cfg)
    with torch.no_grad():
        w = dict(ref_b.named_parameters())["backbone.conv1.weight"]
        w.view(-1)[0] += eps
    accs_a = _torch_recipe(ref_a, train_arrays, val_arrays, epochs, batch_size,
                           lr, 70, stage_seed)
    accs_b = _torch_recipe(ref_b, train_arrays, val_arrays, epochs, batch_size,
                           lr, 70, stage_seed)
    final = _torch_agreement(ref_a, ref_b, val_arrays, batch_size)
    result = {
        "control": f"torch vs torch(+{eps:g} on one conv1 weight), "
                   f"{'negative' if loss_status == -1 else 'positive'} "
                   f"SCOUTER recipe, {epochs} epochs x "
                   f"{n_train // batch_size} steps",
        "torch_a_val_acc": accs_a, "torch_b_val_acc": accs_b, "final": final,
    }
    kind = "negative" if loss_status == -1 else "positive"
    lines = ["# Chaos control: torch vs eps-perturbed torch "
             f"({kind} SCOUTER recipe)", "", result["control"], "",
             "| epoch | torch(a) val acc | torch(b=a+eps) val acc | delta (pt) |",
             "|---|---|---|---|"]
    for e, (a, b) in enumerate(zip(accs_a, accs_b)):
        lines.append(f"| {e + 1} | {a:.4f} | {b:.4f} | {100 * (b - a):+.2f} |")
    lines += ["", f"final: top-1 agreement {final['agreement']:.4f} "
                  f"(a {final['acc_a']:.4f}, b {final['acc_b']:.4f}, "
                  f"n={final['n']})", ""]
    report = "\n".join(lines)
    print(report)
    if out_path:
        with open(out_path, "w") as fh:
            fh.write(report + "\n")
        with open(os.path.splitext(out_path)[0] + ".json", "w") as fh:
            json.dump(result, fh, indent=2)
    return result


def run_negative_convergence(epochs=20, n_train=512, n_val=128, batch_size=8,
                             img_size=260, lr=1e-4, seed=0, probes=8,
                             out_path=None, loss_status=-1):
    """Extended-horizon convergence comparison on the from-scratch negative
    SCOUTER recipe (README.md:99-105): train BOTH frameworks from identical
    init for `epochs` epochs (default 20 x 64 = 1280 optimizer steps) and
    compare the val-accuracy trajectories once past the chaotic early-training
    regime, plus final agreement and trained-model heatmap IoU.

    The 4-epoch full-recipe chain compares models at 8-33% accuracy where
    fp32 chaos dominates; this run checks the claim that both frameworks
    converge to statistically equivalent accuracy at the plateau.
    ``loss_status=1`` runs the same comparison on the positive slot head
    (from-scratch, no use_pre — a controlled variant of README.md:91-97).
    """
    import torch

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")

    from scouter_tpu.core import ScouterConfig
    from scouter_tpu.models import torch_state_dict_to_variables

    from test_models import install_reference_stubs
    from test_slot_model import _make_ref_slot_model

    install_reference_stubs()
    train_arrays, val_arrays = _make_mnist_arrays(img_size, n_train, n_val, seed)
    probe_imgs = val_arrays[0][:probes]
    # negative: the README.md:99-105 hyperparams; positive: README.md:91-97
    # (spc=1, power=1, lambda=1.0), run from scratch instead of use_pre so the
    # comparison is a single controlled stage.
    spc, power, lam = (2, 2, 1.5) if loss_status == -1 else (1, 1, 1.0)
    cfg = ScouterConfig(model="resnet18", dataset="MNIST", num_classes=10,
                        channel=512, img_size=img_size, batch_size=batch_size,
                        pre_trained=False, freeze_layers=0, use_slot=True,
                        use_pre=False, loss_status=loss_status,
                        slots_per_class=spc, power=power, to_k_layer=1,
                        lambda_value=lam)
    stage_seed = seed + 2
    torch.manual_seed(stage_seed)
    ref = _make_ref_slot_model(cfg)
    variables = torch_state_dict_to_variables(
        {k: v.clone() for k, v in ref.state_dict().items()})
    t_accs = _torch_recipe(ref, train_arrays, val_arrays, epochs, batch_size,
                           lr, 70, stage_seed)
    state, j_accs, model = _jax_recipe(cfg, variables, train_arrays,
                                       val_arrays, epochs, batch_size, lr,
                                       stage_seed)
    final = _final_agreement(ref, model, state, val_arrays, batch_size)
    iou = _aggregate_iou(
        _heatmap_reports(ref, model, state.variables(), probe_imgs, cfg),
        cfg.num_classes)
    kind = "negative" if loss_status == -1 else "positive"
    result = {
        "data": f"SYNTHETIC MNIST ({n_train} train / {n_val} val, {img_size}px,"
                f" {epochs} epochs, bs={batch_size}, "
                f"{epochs * (n_train // batch_size)} steps, "
                f"loss_status={loss_status})",
        "torch_val_acc": t_accs, "jax_val_acc": j_accs, "final": final,
        "heatmap_iou_mean": iou["mean"], "heatmap_iou_per_class": iou["per_class"],
    }
    lines = [f"# Extended-horizon convergence: {kind} SCOUTER, "
             "torch reference vs scouter-tpu", "", result["data"], "",
             "| epoch | torch val acc | jax val acc | delta (pt) |",
             "|---|---|---|---|"]
    for e, (t, j) in enumerate(zip(t_accs, j_accs)):
        lines.append(f"| {e + 1} | {t:.4f} | {j:.4f} | {100 * (j - t):+.2f} |")
    m = iou["mean"]
    lines += ["", f"final: top-1 agreement {final['agreement']:.4f} "
                  f"(torch {final['torch_acc']:.4f}, jax "
                  f"{final['jax_acc']:.4f}, n={final['n']})",
              f"trained-model heatmap IoU (mean over {probes} probes): "
              f"soft {m['soft_iou']:.4f}, @128 {m['iou@128']:.4f}", ""]
    report = "\n".join(lines)
    print(report)
    if out_path:
        with open(out_path, "w") as fh:
            fh.write(report + "\n")
        with open(os.path.splitext(out_path)[0] + ".json", "w") as fh:
            json.dump(result, fh, indent=2)
    return result


def _iou_floor_once(epochs=20, n_train=512, n_val=128, batch_size=8,
                    img_size=260, lr=1e-4, seed=0, eps=1e-6, probes=8,
                    loss_status=-1):
    """One replicate of the heatmap-IoU noise-floor protocol (see
    :func:`run_iou_floor`, which runs several independent replicates and
    aggregates — the r4 adjudication rested on a single pair per condition,
    VERDICT r4 weak item 4).

    The trained-model cross-framework IoU numbers (docs/FULL_RECIPE_PARITY_r3,
    NEGATIVE_CONVERGENCE_r3) float with no baseline: nobody can say whether
    soft-IoU 0.68 at 20 epochs is "parity within trained-model chaos" or a
    real heatmap divergence. This run measures the floor. FOUR models train
    on the IDENTICAL stream (same data, same batch order, negative SCOUTER
    recipe, README.md:99-105):

      torch A   (init seed s)
      torch B = A + eps on one conv1 weight  -> IoU(A,B): the Lyapunov floor
      torch C   (independent init seed)      -> IoU(A,C): the seed floor
      jax   J   (identical init to A)        -> IoU(A,J): cross-framework

    and every pair goes through the SAME IoU pipeline (the reference's own
    PNG vis flow for torch maps, test.py:33-38 resize; iou_table) at epoch 4
    and at the final epoch. The parity claim is quantitative: IoU(A,J) is
    "within the floor" iff it falls at or above the torch-vs-torch(eps)
    band. Match: test.py:33-38, sloter/utils/slot_attention.py:68-85.
    """
    import torch

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")

    from scouter_tpu.models import build_slot_model, torch_state_dict_to_variables

    from test_models import install_reference_stubs
    from test_slot_model import _make_ref_slot_model

    install_reference_stubs()
    train_arrays, val_arrays = _make_mnist_arrays(img_size, n_train, n_val, seed)
    probe_imgs = val_arrays[0][:probes]
    cfg = _sweep_cfg(loss_status, img_size, batch_size)
    snapshot_epochs = sorted({min(4, epochs), epochs})  # 1-based horizons
    stage_seed = seed + 2  # the seed the r3 convergence runs used

    torch.manual_seed(stage_seed)
    ref_a = _make_ref_slot_model(cfg)
    sd_a = {k: v.clone() for k, v in ref_a.state_dict().items()}
    torch.manual_seed(stage_seed)
    ref_b = _make_ref_slot_model(cfg)
    with torch.no_grad():
        w = dict(ref_b.named_parameters())["backbone.conv1.weight"]
        w.view(-1)[0] += eps
    torch.manual_seed(stage_seed + 7919)  # independent init draw
    ref_c = _make_ref_slot_model(cfg)
    variables_j = torch_state_dict_to_variables(
        {k: v.clone() for k, v in sd_a.items()})

    maps = {}   # (name, horizon) -> [probe][class] heatmaps
    accs = {}

    def torch_hook(name, ref):
        def on_epoch(epoch):
            if (epoch + 1) in snapshot_epochs:
                maps[(name, epoch + 1)] = _torch_probe_maps(ref, probe_imgs, cfg)
                print(f"[iou-floor] {name} snapshot @ epoch {epoch + 1}",
                      flush=True)
        return on_epoch

    for name, ref in (("A", ref_a), ("B", ref_b), ("C", ref_c)):
        accs[name] = _torch_recipe(ref, train_arrays, val_arrays, epochs,
                                   batch_size, lr, 70, stage_seed,
                                   on_epoch=torch_hook(name, ref))
        print(f"[iou-floor] torch {name} done: final val acc "
              f"{accs[name][-1]:.4f}", flush=True)

    model_j = build_slot_model(cfg)

    def jax_hook(epoch, state):
        if (epoch + 1) in snapshot_epochs:
            maps[("J", epoch + 1)] = _jax_probe_maps(
                model_j, state.variables(), probe_imgs, cfg)
            print(f"[iou-floor] J snapshot @ epoch {epoch + 1}", flush=True)

    _, accs["J"], _ = _jax_recipe(cfg, variables_j, train_arrays, val_arrays,
                                  epochs, batch_size, lr, stage_seed,
                                  on_epoch=jax_hook)
    print(f"[iou-floor] jax done: final val acc {accs['J'][-1]:.4f}", flush=True)

    pairs = ("A-B", "A-C", "A-J")
    result = {"val_acc": accs, "horizons": {}}
    for h in snapshot_epochs:
        row = {}
        for pair in pairs:
            a, b = pair.split("-")
            agg = _pair_iou(maps[(a, h)], maps[(b, h)], cfg.num_classes)
            row[pair] = agg["mean"]
        # verdict per horizon: the meaningful floor is the EPS pair (both
        # torch, identical but one ulp apart — pure fp32 chaos); the seed
        # pair shows what genuinely-different models score. 5% relative
        # margin on the eps floor absorbs probe-sampling noise.
        aj, ab, ac = row["A-J"], row["A-B"], row["A-C"]
        within_eps = all(aj[k] >= 0.95 * ab[k] for k in ("soft_iou", "iou@128"))
        above_seed = all(aj[k] >= ac[k] for k in ("soft_iou", "iou@128"))
        row["within_eps_floor"] = bool(within_eps)
        row["above_seed_floor"] = bool(above_seed)
        row["margin"] = {k: (aj[k] / ab[k] if ab[k] else float("inf"))
                         for k in ("soft_iou", "iou@128")}
        result["horizons"][str(h)] = row
    return result


def run_iou_floor(epochs=20, n_train=512, n_val=128, batch_size=8,
                  img_size=260, lr=1e-4, seed=0, eps=1e-6, probes=8,
                  out_path=None, loss_status=-1, replicates=3):
    """Replicated heatmap-IoU noise floor for the north-star parity claim.

    Runs :func:`_iou_floor_once` ``replicates`` times with independent data
    and init seeds (each replicate trains its own A/B/C/J quadruple) and
    aggregates: per horizon per pair, mean and min..max over replicates of
    soft IoU and IoU@128, plus the per-replicate A-J/A-B margins. The r4
    adjudication (docs/IOU_FLOOR_r4.md) rested on n=1 per condition with a
    thin 0.95x margin — one contrary seed could have flipped it; this
    supersedes it with spread evidence. Match: the reference's rendering flow
    ``test.py:33-44`` + ``sloter/utils/slot_attention.py:68-85``.
    """
    kind = "negative" if loss_status == -1 else "positive"
    horizons = sorted({min(4, epochs), epochs})

    reps = []
    for r in range(replicates):
        rep_seed = seed + 101 * r
        print(f"[iou-floor] === replicate {r + 1}/{replicates} "
              f"(seed {rep_seed}) ===", flush=True)
        rep = _iou_floor_once(
            epochs=epochs, n_train=n_train, n_val=n_val,
            batch_size=batch_size, img_size=img_size, lr=lr, seed=rep_seed,
            eps=eps, probes=probes, loss_status=loss_status)
        rep["seed"] = rep_seed
        reps.append(rep)
        # aggregate + write after EVERY replicate: each one is hours of
        # single-CPU training, so an interrupted run still leaves an honest
        # n=len(reps) artifact on disk rather than nothing
        result = _iou_floor_aggregate(
            reps, replicates, kind, horizons, epochs, n_train, batch_size,
            probes, eps, img_size, out_path)
    return result


def _iou_floor_aggregate(reps, replicates, kind, horizons, epochs, n_train,
                         batch_size, probes, eps, img_size, out_path):
    """Aggregate iou-floor replicates and (re)write the report artifacts."""
    partial = "" if len(reps) == replicates else \
        f" [PARTIAL: {len(reps)}/{replicates} replicates complete]"
    seeds = [r.get("seed") for r in reps]
    setup = (f"{kind} SCOUTER recipe, {len(reps)} independent replicates"
             f"{partial} (seeds {seeds}), {epochs} epochs x "
             f"{n_train // batch_size} steps, {probes} probes, eps={eps:g}, "
             f"horizons={horizons}, SYNTHETIC MNIST {img_size}px")
    result = {"setup": setup, "replicates": reps, "horizons": {}}
    lines = [f"# Heatmap-IoU noise floor ({kind} SCOUTER recipe, "
             f"n={len(reps)} replicates)", "", setup, "",
             "| horizon | pair | soft IoU mean (min..max) | "
             "IoU@128 mean (min..max) |", "|---|---|---|---|"]
    for h in horizons:
        hrow = {}
        for pair in ("A-B", "A-C", "A-J"):
            softs = [rep["horizons"][str(h)][pair]["soft_iou"] for rep in reps]
            hards = [rep["horizons"][str(h)][pair]["iou@128"] for rep in reps]
            hrow[pair] = {
                "soft_iou": {"mean": float(np.mean(softs)),
                             "min": float(np.min(softs)),
                             "max": float(np.max(softs))},
                "iou@128": {"mean": float(np.mean(hards)),
                            "min": float(np.min(hards)),
                            "max": float(np.max(hards))},
            }
            s, d = hrow[pair]["soft_iou"], hrow[pair]["iou@128"]
            lines.append(
                f"| {h} ep | {pair} | {s['mean']:.4f} ({s['min']:.4f}.."
                f"{s['max']:.4f}) | {d['mean']:.4f} ({d['min']:.4f}.."
                f"{d['max']:.4f}) |")
        margins = [rep["horizons"][str(h)]["margin"] for rep in reps]
        per_rep_within = [rep["horizons"][str(h)]["within_eps_floor"]
                          for rep in reps]
        mean_within = all(
            hrow["A-J"][k]["mean"] >= 0.95 * hrow["A-B"][k]["mean"]
            for k in ("soft_iou", "iou@128"))
        verdict = ("within eps-chaos floor (all replicates)"
                   if all(per_rep_within) else
                   f"within eps-chaos floor on mean "
                   f"({sum(per_rep_within)}/{len(reps)} replicates "
                   f"individually)" if mean_within else
                   "NOT within the eps-chaos floor")
        hrow["margins_AJ_over_AB"] = margins
        hrow["per_replicate_within_eps"] = per_rep_within
        hrow["verdict"] = verdict
        result["horizons"][str(h)] = hrow
        lines.append(f"| {h} ep | verdict | {verdict} | |")
        lines.append(
            "| " + f"{h} ep | A-J/A-B margins | soft: " +
            ", ".join(f"{m['soft_iou']:.3f}" for m in margins) + " | @128: " +
            ", ".join(f"{m['iou@128']:.3f}" for m in margins) + " |")
    lines += ["", "pairs: A-B = eps floor (torch vs torch+1e-6: pure fp32 "
              "chaos), A-C = independent-seed floor (genuinely different "
              "models), A-J = cross-framework (identical init).",
              "A-J >= 0.95 x A-B per metric => the cross-framework heatmap "
              "deltas are inside trained-model fp32 chaos, not a framework "
              "divergence; A-J ~ A-C would mean the frameworks train "
              "genuinely different explanations.", ""]
    report = "\n".join(lines)
    print(report, flush=True)
    if out_path:
        with open(out_path, "w") as fh:
            fh.write(report + "\n")
        with open(os.path.splitext(out_path)[0] + ".json", "w") as fh:
            json.dump(result, fh, indent=2, default=float)
    return result


def _make_digits_arrays(img_size, n_train, n_val, seed):
    """REAL handwritten digits (UCI optdigits via sklearn — the only real
    image data available in this zero-egress environment), shaped exactly
    like the synthetic-MNIST path: 8x8/16-level scans -> uint8 28x28 canvas
    (bilinear, PIL) -> the SAME ``preprocess_batch(dataset='MNIST')`` resize
    + normalize both frameworks consume. Disjoint shuffled train/val split."""
    from PIL import Image
    import jax.numpy as jnp

    from scouter_tpu.data.transforms import preprocess_batch
    from sklearn.datasets import load_digits

    d = load_digits()
    order = np.random.RandomState(seed).permutation(len(d.images))
    if n_train + n_val > len(order):
        raise ValueError(f"digits has {len(order)} images < "
                         f"{n_train}+{n_val} requested")
    u8 = np.round(d.images / 16.0 * 255.0).astype(np.uint8)
    up = np.stack([np.asarray(Image.fromarray(im, mode="L").resize(
        (28, 28), Image.BILINEAR)) for im in u8])[..., None]
    labels = d.target.astype(np.int64)

    def prep(sel):
        out = []
        for i in range(0, len(sel), 64):
            out.append(np.asarray(preprocess_batch(
                jnp.asarray(up[sel[i:i + 64]]), dataset="MNIST",
                img_size=img_size)))
        return np.concatenate(out).astype(np.float32)

    tr, va = order[:n_train], order[n_train:n_train + n_val]
    return (prep(tr), labels[tr]), (prep(va), labels[va])


def run_real_digits(epochs=20, n_train=512, n_val=256, batch_size=8,
                    img_size=260, lr=1e-4, seed=0, eps=1e-6, probes=8,
                    out_path=None, loss_status=1):
    """North-star cross-framework parity on REAL images.

    Every prior accuracy/IoU figure in this repo is synthetic (zero-egress
    environment — VERDICT r4 missing item 1). sklearn ships the UCI
    handwritten-digits test set (1,797 real 8x8 scans) inside its wheel, so
    this run puts the BASELINE.json north-star contract ("top-1 + heatmap-IoU
    parity") on real data as far as this environment allows: torch reference
    A and jax J train from identical init on the identical real-image stream
    (positive SCOUTER recipe by default — the reference's headline MNIST
    configuration, /root/reference/README.md:99-105), with a torch+eps twin B
    as the fp32-chaos control. Reports per-epoch REAL val top-1 for both
    frameworks, final prediction agreement, and trained-model heatmap IoU
    (A-J) against the eps floor (A-B) at epoch 4 and the final epoch — the
    same verdict rule as the synthetic floor (docs/IOU_FLOOR_r5.md).
    Match: test.py:33-44 rendering, sloter/utils/slot_attention.py:68-85.
    """
    import torch

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")

    from scouter_tpu.models import build_slot_model, torch_state_dict_to_variables

    from test_models import install_reference_stubs
    from test_slot_model import _make_ref_slot_model

    install_reference_stubs()
    train_arrays, val_arrays = _make_digits_arrays(img_size, n_train, n_val, seed)
    probe_imgs = val_arrays[0][:probes]
    cfg = _sweep_cfg(loss_status, img_size, batch_size)
    snapshot_epochs = sorted({min(4, epochs), epochs})
    stage_seed = seed + 2

    torch.manual_seed(stage_seed)
    ref_a = _make_ref_slot_model(cfg)
    sd_a = {k: v.clone() for k, v in ref_a.state_dict().items()}
    torch.manual_seed(stage_seed)
    ref_b = _make_ref_slot_model(cfg)
    with torch.no_grad():
        w = dict(ref_b.named_parameters())["backbone.conv1.weight"]
        w.view(-1)[0] += eps
    variables_j = torch_state_dict_to_variables(
        {k: v.clone() for k, v in sd_a.items()})

    maps, accs = {}, {}

    def torch_hook(name, ref):
        def on_epoch(epoch):
            if (epoch + 1) in snapshot_epochs:
                maps[(name, epoch + 1)] = _torch_probe_maps(ref, probe_imgs, cfg)
                print(f"[real-digits] {name} snapshot @ epoch {epoch + 1}",
                      flush=True)
        return on_epoch

    for name, ref in (("A", ref_a), ("B", ref_b)):
        accs[name] = _torch_recipe(ref, train_arrays, val_arrays, epochs,
                                   batch_size, lr, 70, stage_seed,
                                   on_epoch=torch_hook(name, ref))
        print(f"[real-digits] torch {name} done: final val acc "
              f"{accs[name][-1]:.4f}", flush=True)

    model_j = build_slot_model(cfg)

    def jax_hook(epoch, state):
        if (epoch + 1) in snapshot_epochs:
            maps[("J", epoch + 1)] = _jax_probe_maps(
                model_j, state.variables(), probe_imgs, cfg)
            print(f"[real-digits] J snapshot @ epoch {epoch + 1}", flush=True)

    state_j, accs["J"], _ = _jax_recipe(
        cfg, variables_j, train_arrays, val_arrays, epochs, batch_size, lr,
        stage_seed, on_epoch=jax_hook)
    print(f"[real-digits] jax done: final val acc {accs['J'][-1]:.4f}",
          flush=True)

    agreement = _final_agreement(ref_a, model_j, state_j, val_arrays,
                                 batch_size)

    kind = "negative" if loss_status == -1 else "positive"
    setup = (f"REAL DATA: UCI handwritten digits (sklearn), {kind} SCOUTER "
             f"recipe, {epochs} epochs x {n_train // batch_size} steps, "
             f"train/val {n_train}/{n_val}, {probes} probes, eps={eps:g}, "
             f"seed={seed}, {img_size}px")
    result = {"setup": setup, "val_acc": accs, "agreement": agreement,
              "horizons": {}}
    lines = [f"# North-star parity on REAL images (UCI digits, {kind} "
             "recipe)", "", setup, "",
             f"final REAL val top-1: torch {accs['A'][-1]:.4f}, jax "
             f"{accs['J'][-1]:.4f}, torch+eps {accs['B'][-1]:.4f}; "
             f"prediction agreement (A vs J) "
             f"{agreement['agreement']:.4f} over n={agreement['n']}", "",
             "| horizon | pair | soft IoU | IoU@128 |", "|---|---|---|---|"]
    for h in snapshot_epochs:
        row = {}
        for pair in ("A-B", "A-J"):
            a, b = pair.split("-")
            row[pair] = _pair_iou(maps[(a, h)], maps[(b, h)],
                                  cfg.num_classes)["mean"]
            lines.append(f"| {h} ep | {pair} | {row[pair]['soft_iou']:.4f} "
                         f"| {row[pair]['iou@128']:.4f} |")
        aj, ab = row["A-J"], row["A-B"]
        row["within_eps_floor"] = bool(all(
            aj[k] >= 0.95 * ab[k] for k in ("soft_iou", "iou@128")))
        row["margin"] = {k: (aj[k] / ab[k] if ab[k] else float("inf"))
                         for k in ("soft_iou", "iou@128")}
        result["horizons"][str(h)] = row
        lines.append(f"| {h} ep | verdict | within eps floor: "
                     f"{row['within_eps_floor']} | margins soft "
                     f"{row['margin']['soft_iou']:.3f} / @128 "
                     f"{row['margin']['iou@128']:.3f} |")
    lines += ["", "A/B = torch reference (B = A + 1e-6 on one conv1 weight: "
              "the fp32-chaos floor), J = this framework from identical "
              "init on the identical real-image stream. A-J >= 0.95 x A-B "
              "per metric => cross-framework heatmap deltas on real data "
              "are inside trained-model fp32 chaos.", ""]
    report = "\n".join(lines)
    print(report, flush=True)
    if out_path:
        with open(out_path, "w") as fh:
            fh.write(report + "\n")
        with open(os.path.splitext(out_path)[0] + ".json", "w") as fh:
            json.dump(result, fh, indent=2, default=float)
    return result


def _jax_agreement(model, state_a, state_b, val_arrays, batch_size):
    """Top-1 agreement between two trained jax states (the jax-vs-jax
    analogue of _torch_agreement)."""
    import jax.numpy as jnp

    x_va, y_va = val_arrays
    agree = a_c = b_c = total = 0
    for s in range(0, len(x_va), batch_size):
        xb, yb = x_va[s:s + batch_size], y_va[s:s + batch_size]
        pa = np.asarray(model.apply(state_a.variables(),
                                    jnp.asarray(xb))["logits"]).argmax(1)
        pb = np.asarray(model.apply(state_b.variables(),
                                    jnp.asarray(xb))["logits"]).argmax(1)
        agree += int((pa == pb).sum())
        a_c += int((pa == yb).sum())
        b_c += int((pb == yb).sum())
        total += len(yb)
    return {"agreement": agree / total, "acc_a": a_c / total,
            "acc_b": b_c / total, "n": total}


def _sweep_cfg(loss_status, img_size, batch_size):
    from scouter_tpu.core import ScouterConfig

    spc, power, lam = (2, 2, 1.5) if loss_status == -1 else (1, 1, 1.0)
    return ScouterConfig(model="resnet18", dataset="MNIST", num_classes=10,
                         channel=512, img_size=img_size,
                         batch_size=batch_size, pre_trained=False,
                         freeze_layers=0, use_slot=True, use_pre=False,
                         loss_status=loss_status, slots_per_class=spc,
                         power=power, to_k_layer=1, lambda_value=lam)


def run_jax_chaos_control(epochs=20, n_train=512, n_val=128, batch_size=8,
                          img_size=260, lr=1e-4, seed=0, eps=1e-6,
                          out_path=None, loss_status=1, platform="cpu"):
    """Lyapunov control INSIDE this framework: train the jax model twice from
    inits that differ by a single eps on one conv1 weight element — the
    jax-vs-jax analogue of run_chaos_control.

    Purpose: adjudicate the positive-recipe plateau question from
    docs/POSITIVE_CONVERGENCE_r3.md (torch settles at 0.2812, jax at 0.1562).
    The torch-vs-torch(eps) control rejoined the 0.2812 plateau; if
    jax-vs-jax(eps) scatters across plateaus (or rejoins a different one),
    the recipe has multiple attractors reachable from ulp-scale init
    differences and the cross-framework gap is attractor noise, not a
    framework divergence. If every eps-jax run re-converges to 0.1562 while
    torch always finds 0.2812, the divergence is real and needs a mechanism.
    """
    import torch

    import jax

    if platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")

    from scouter_tpu.models import torch_state_dict_to_variables

    from test_models import install_reference_stubs
    from test_slot_model import _make_ref_slot_model

    install_reference_stubs()
    train_arrays, val_arrays = _make_mnist_arrays(img_size, n_train, n_val, seed)
    cfg = _sweep_cfg(loss_status, img_size, batch_size)
    stage_seed = seed + 2  # the same seed the convergence runs used
    torch.manual_seed(stage_seed)
    ref = _make_ref_slot_model(cfg)
    sd = {k: v.clone() for k, v in ref.state_dict().items()}
    variables_a = torch_state_dict_to_variables(
        {k: v.clone() for k, v in sd.items()})
    sd["backbone.conv1.weight"].view(-1)[0] += eps
    variables_b = torch_state_dict_to_variables(sd)
    state_a, accs_a, model = _jax_recipe(cfg, variables_a, train_arrays,
                                         val_arrays, epochs, batch_size, lr,
                                         stage_seed)
    state_b, accs_b, _ = _jax_recipe(cfg, variables_b, train_arrays,
                                     val_arrays, epochs, batch_size, lr,
                                     stage_seed)
    final = _jax_agreement(model, state_a, state_b, val_arrays, batch_size)
    kind = "negative" if loss_status == -1 else "positive"
    result = {
        "control": f"jax vs jax(+{eps:g} on one conv1 weight), {kind} "
                   f"SCOUTER recipe, {epochs} epochs x "
                   f"{n_train // batch_size} steps, platform={platform}",
        "jax_a_val_acc": accs_a, "jax_b_val_acc": accs_b, "final": final,
    }
    lines = ["# Chaos control: jax vs eps-perturbed jax "
             f"({kind} SCOUTER recipe)", "", result["control"], "",
             "| epoch | jax(a) val acc | jax(b=a+eps) val acc | delta (pt) |",
             "|---|---|---|---|"]
    for e, (a, b) in enumerate(zip(accs_a, accs_b)):
        lines.append(f"| {e + 1} | {a:.4f} | {b:.4f} | {100 * (b - a):+.2f} |")
    lines += ["", f"final: top-1 agreement {final['agreement']:.4f} "
                  f"(a {final['acc_a']:.4f}, b {final['acc_b']:.4f}, "
                  f"n={final['n']})", ""]
    report = "\n".join(lines)
    print(report)
    if out_path:
        with open(out_path, "w") as fh:
            fh.write(report + "\n")
        with open(os.path.splitext(out_path)[0] + ".json", "w") as fh:
            json.dump(result, fh, indent=2)
    return result


def run_plateau_sweep(epochs=20, n_train=512, n_val=128, batch_size=8,
                      img_size=260, lr=1e-4, seed=0, seeds=(0, 1, 2, 3),
                      loss_status=1, framework="both", out_path=None,
                      platform="cpu"):
    """Init-seed sweep of the from-scratch recipe plateau in one or both
    frameworks: same data (data seed fixed), independent (init, batch-order)
    draw per sweep seed, shared per-seed across frameworks so each row is an
    identical-init pair. Reports the last-5-epoch mean ("plateau") and final
    val acc per run, plus per-framework mean/std.

    This is the distributional answer to the positive-plateau question: if
    the per-seed plateaus of both frameworks are draws from the same spread,
    the single-seed 0.2812-vs-0.1562 gap in POSITIVE_CONVERGENCE_r3 is
    attractor noise.
    """
    import torch

    import jax

    if platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")

    from scouter_tpu.models import torch_state_dict_to_variables

    from test_models import install_reference_stubs
    from test_slot_model import _make_ref_slot_model

    install_reference_stubs()
    train_arrays, val_arrays = _make_mnist_arrays(img_size, n_train, n_val, seed)
    cfg = _sweep_cfg(loss_status, img_size, batch_size)
    rows = []
    for s in seeds:
        run_seed = 1000 + int(s)
        torch.manual_seed(run_seed)
        ref = _make_ref_slot_model(cfg)
        row = {"seed": int(s)}
        if framework in ("both", "jax"):
            variables = torch_state_dict_to_variables(
                {k: v.clone() for k, v in ref.state_dict().items()})
            _, j_accs, _ = _jax_recipe(cfg, variables, train_arrays,
                                       val_arrays, epochs, batch_size, lr,
                                       run_seed)
            row["jax_val_acc"] = j_accs
        if framework in ("both", "torch"):
            t_accs = _torch_recipe(ref, train_arrays, val_arrays, epochs,
                                   batch_size, lr, 70, run_seed)
            row["torch_val_acc"] = t_accs
        rows.append(row)
        print(f"[plateau-sweep] seed {s} done: "
              + ", ".join(f"{k.split('_')[0]} plateau "
                          f"{np.mean(v[-5:]):.4f}" for k, v in row.items()
                          if k.endswith("_val_acc")), flush=True)

    def _stats(key):
        plats = [float(np.mean(r[key][-5:])) for r in rows if key in r]
        finals = [float(r[key][-1]) for r in rows if key in r]
        if not plats:
            return None
        return {"plateau_per_seed": plats, "final_per_seed": finals,
                "plateau_mean": float(np.mean(plats)),
                "plateau_std": float(np.std(plats)),
                "plateau_min": float(np.min(plats)),
                "plateau_max": float(np.max(plats))}

    kind = "negative" if loss_status == -1 else "positive"
    result = {
        "sweep": f"{kind} SCOUTER recipe, {epochs} epochs x "
                 f"{n_train // batch_size} steps, seeds {list(seeds)}, "
                 f"framework={framework}, platform={platform}",
        "rows": rows,
        "torch": _stats("torch_val_acc"), "jax": _stats("jax_val_acc"),
    }
    if result["torch"] and result["jax"]:
        # paired per-seed analysis: each row is an identical-init pair, so
        # the per-seed delta is the right unit; a two-sided sign test asks
        # whether either framework systematically wins (scipy-free exact
        # binomial — n is small)
        t_p = result["torch"]["plateau_per_seed"]
        j_p = result["jax"]["plateau_per_seed"]
        deltas = [j - t for t, j in zip(t_p, j_p)]
        nonzero = [d for d in deltas if d != 0.0]
        n_nz, k_pos = len(nonzero), sum(1 for d in nonzero if d > 0)
        from math import comb
        if n_nz:
            tail = min(k_pos, n_nz - k_pos)
            p_sign = min(1.0, 2 * sum(comb(n_nz, i) for i in range(tail + 1))
                         / 2 ** n_nz)
        else:
            p_sign = 1.0
        result["paired"] = {
            "plateau_delta_per_seed": deltas,
            "delta_mean": float(np.mean(deltas)),
            "delta_std": float(np.std(deltas)),
            "sign_test": {"n_nonzero": n_nz, "k_jax_wins": k_pos,
                          "p_two_sided": p_sign},
        }
    lines = [f"# Plateau sweep: {kind} SCOUTER recipe, init-seed "
             "distribution", "", result["sweep"], "",
             "| seed | torch plateau (last-5 mean) | torch final | "
             "jax plateau (last-5 mean) | jax final |", "|---|---|---|---|---|"]
    for r in rows:
        t = r.get("torch_val_acc")
        j = r.get("jax_val_acc")
        lines.append(
            f"| {r['seed']} | "
            + (f"{np.mean(t[-5:]):.4f} | {t[-1]:.4f} | " if t else "— | — | ")
            + (f"{np.mean(j[-5:]):.4f} | {j[-1]:.4f} |" if j else "— | — |"))
    for name in ("torch", "jax"):
        st = result[name]
        if st:
            lines.append("")
            lines.append(f"{name}: plateau mean {st['plateau_mean']:.4f} "
                         f"± {st['plateau_std']:.4f} "
                         f"(range {st['plateau_min']:.4f}-"
                         f"{st['plateau_max']:.4f}, n={len(st['plateau_per_seed'])})")
    if result.get("paired"):
        pr = result["paired"]
        st = pr["sign_test"]
        lines.append("")
        lines.append(
            f"paired per-seed plateau delta (jax - torch): "
            f"{pr['delta_mean']:+.4f} ± {pr['delta_std']:.4f}; sign test "
            f"jax wins {st['k_jax_wins']}/{st['n_nonzero']}, two-sided "
            f"p = {st['p_two_sided']:.3f} "
            f"({'no' if st['p_two_sided'] > 0.05 else 'a'} systematic "
            f"framework effect at alpha=0.05)")
    lines.append("")
    report = "\n".join(lines)
    print(report)
    if out_path:
        with open(out_path, "w") as fh:
            fh.write(report + "\n")
        with open(os.path.splitext(out_path)[0] + ".json", "w") as fh:
            json.dump(result, fh, indent=2)
    return result


def main(argv=None):
    from scouter_tpu.core import ScouterConfig

    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--mode", default="parity",
                    choices=["parity", "full-recipe", "chaos-control",
                             "negative-convergence", "jax-chaos-control",
                             "plateau-sweep", "iou-floor", "real-digits"],
                    help="parity: short side-by-side trajectory (default); "
                         "full-recipe: the 3-stage README chain in both "
                         "frameworks; chaos-control: torch vs eps-perturbed "
                         "torch (Lyapunov floor); negative-convergence: "
                         "extended-horizon plateau comparison; "
                         "jax-chaos-control: jax vs eps-perturbed jax; "
                         "plateau-sweep: init-seed plateau distribution; "
                         "iou-floor: trained-model heatmap-IoU noise floor "
                         "(torch-vs-torch-eps/seed vs cross-framework); "
                         "real-digits: north-star parity on REAL images "
                         "(UCI handwritten digits via sklearn)")
    ap.add_argument("--epochs", type=int, default=None,
                    help="epochs per stage for the recipe modes")
    ap.add_argument("--out_path", default=None,
                    help="report path for the recipe modes")
    ap.add_argument("--model", default="resnet18")
    ap.add_argument("--dataset", default="ImageNet")
    ap.add_argument("--num_classes", type=int, default=4)
    ap.add_argument("--channel", type=int, default=512)
    ap.add_argument("--slots_per_class", type=int, default=2)
    ap.add_argument("--loss_status", type=int, default=None,
                    help="1 positive / -1 negative (parity default 1; "
                         "negative-convergence default -1)")
    ap.add_argument("--power", type=int, default=2)
    ap.add_argument("--to_k_layer", type=int, default=1)
    ap.add_argument("--lambda_value", type=float, default=1.0)
    ap.add_argument("--img_size", type=int, default=288)
    ap.add_argument("--batch_size", type=int, default=4)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--probes", type=int, default=4)
    ap.add_argument("--val_batches", type=int, default=2)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--data_dir", default=None,
                    help="real dataset root; omit for the synthetic stream")
    ap.add_argument("--out_dir", default=None)
    ap.add_argument("--platform", default="cpu", choices=["cpu", "tpu"],
                    help="jax backend for jax-chaos-control / plateau-sweep "
                         "(tpu = leave the axon plugin's default backend)")
    ap.add_argument("--seeds", default="0,1,2,3",
                    help="comma list of init seeds for plateau-sweep")
    ap.add_argument("--replicates", type=int, default=3,
                    help="independent replicates for iou-floor")
    ap.add_argument("--framework", default="both",
                    choices=["both", "torch", "jax"],
                    help="which side(s) plateau-sweep trains")
    ns = ap.parse_args(argv)

    if ns.mode != "parity":
        kwargs = dict(lr=ns.lr, seed=ns.seed, out_path=ns.out_path)
        if ns.epochs is not None:
            kwargs["epochs"] = ns.epochs
        # forward batch_size only when explicitly given (the recipe functions
        # default to 8, the parity parser to 4 — inheriting the parser default
        # would silently change the recipe)
        if any(a == "--batch_size" or a.startswith("--batch_size=")
               for a in (argv if argv is not None else sys.argv)):
            kwargs["batch_size"] = ns.batch_size
        # the recipe modes run the fixed MNIST-chain configuration (the torch
        # reference hardcodes 260px/9x9 features); warn about model-shape flags
        # that only the default parity mode consumes
        ignored = [k for k, d in (("model", "resnet18"), ("dataset", "ImageNet"),
                                  ("num_classes", 4), ("channel", 512),
                                  ("slots_per_class", 2), ("power", 2),
                                  ("to_k_layer", 1), ("lambda_value", 1.0),
                                  ("img_size", 288), ("steps", 8),
                                  ("probes", 4), ("val_batches", 2))
                   if getattr(ns, k) != d]
        if ignored:
            print(f"[parity_report] NOTE: --mode {ns.mode} runs the fixed "
                  f"MNIST-chain recipe; ignoring flags: {ignored}")
        if ns.mode in ("negative-convergence", "chaos-control",
                       "jax-chaos-control", "plateau-sweep", "iou-floor",
                       "real-digits") \
                and ns.loss_status is not None:
            kwargs["loss_status"] = ns.loss_status
        if ns.mode in ("jax-chaos-control", "plateau-sweep"):
            kwargs["platform"] = ns.platform
        if ns.mode == "plateau-sweep":
            kwargs["seeds"] = [int(x) for x in ns.seeds.split(",")]
            kwargs["framework"] = ns.framework
        if ns.mode == "iou-floor":
            kwargs["replicates"] = ns.replicates
        fn = {"full-recipe": run_full_recipe,
              "chaos-control": run_chaos_control,
              "negative-convergence": run_negative_convergence,
              "jax-chaos-control": run_jax_chaos_control,
              "plateau-sweep": run_plateau_sweep,
              "iou-floor": run_iou_floor,
              "real-digits": run_real_digits}[ns.mode]
        fn(**kwargs)
        return

    cfg = ScouterConfig(
        model=ns.model, dataset=ns.dataset, num_classes=ns.num_classes,
        channel=ns.channel, use_slot=True, slots_per_class=ns.slots_per_class,
        power=ns.power, to_k_layer=ns.to_k_layer,
        loss_status=1 if ns.loss_status is None else ns.loss_status,
        lambda_value=ns.lambda_value, img_size=ns.img_size,
        batch_size=ns.batch_size, pre_trained=False, freeze_layers=0,
    )
    run_parity(cfg, steps=ns.steps, probes=ns.probes, val_batches=ns.val_batches,
               seed=ns.seed, lr=ns.lr, data_dir=ns.data_dir, out_dir=ns.out_dir)


if __name__ == "__main__":
    main()
