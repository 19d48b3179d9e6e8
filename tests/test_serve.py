"""Serving subsystem tests: AOT StableHLO export (jax.export) round-trip,
batch polymorphism, in-program slot-map rendering parity with the host
renderer, and the micro-batching InferenceEngine."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from scouter_tpu.core import ScouterConfig
from scouter_tpu.explain.vis import attention_to_maps
from scouter_tpu.models import build_slot_model
from scouter_tpu.serve import (
    InferenceEngine,
    export_serving,
    load_artifact,
    make_serving_fn,
    save_artifact,
)


def small_cfg(**kw):
    base = dict(
        model="resnet10", dataset="MNIST", num_classes=3, channel=512,
        use_slot=True, slots_per_class=2, power=1, loss_status=1, to_k_layer=1,
        lambda_value=1.0, img_size=64, batch_size=4, epochs=1, lr=1e-3,
        pre_trained=False, freeze_layers=0, output_dir="", seed=0,
    )
    base.update(kw)
    return ScouterConfig(**base)


def init_variables(cfg):
    model = build_slot_model(cfg)
    x = jnp.zeros((1, cfg.img_size, cfg.img_size, 1), jnp.float32)
    return model.init(jax.random.PRNGKey(0), x)


def probe_images(cfg, n, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, (n, cfg.img_size, cfg.img_size, 1), np.uint8)


class TestExport:
    def test_round_trip_dynamic_batch(self, tmp_path):
        """One batch-polymorphic artifact serves multiple batch sizes and
        matches the live model bit-for-tolerance."""
        cfg = small_cfg()
        variables = init_variables(cfg)
        exported = export_serving(cfg, variables, batch=None)
        path = str(tmp_path / "model.shlo")
        assert save_artifact(exported, path) > 0

        call = load_artifact(path)
        live = jax.jit(make_serving_fn(cfg, variables))
        for n in (1, 3):
            imgs = probe_images(cfg, n, seed=n)
            got = call(imgs)
            want = live(jnp.asarray(imgs))
            np.testing.assert_allclose(
                np.asarray(got["logits"]), np.asarray(want["logits"]),
                rtol=2e-5, atol=2e-5)
            assert got["slot_maps"].shape == (n, cfg.num_classes, 2, 2)
            np.testing.assert_array_equal(
                np.asarray(got["slot_maps"]), np.asarray(want["slot_maps"]))

    def test_pinned_batch_rejects_other_sizes(self):
        cfg = small_cfg()
        variables = init_variables(cfg)
        exported = export_serving(cfg, variables, batch=2)
        out = exported.call(probe_images(cfg, 2))
        assert np.asarray(out["logits"]).shape == (2, cfg.num_classes)
        with pytest.raises(Exception):
            exported.call(probe_images(cfg, 3))

    def test_slot_maps_match_host_renderer(self):
        """The in-program render must equal explain.vis.attention_to_maps
        (the test.py slot_{id}.png contract) per sample."""
        cfg = small_cfg()
        variables = init_variables(cfg)
        fn = jax.jit(make_serving_fn(cfg, variables))
        imgs = probe_images(cfg, 2, seed=7)
        out = fn(jnp.asarray(imgs))

        from scouter_tpu.data.transforms import preprocess_batch
        model = build_slot_model(cfg)
        x = preprocess_batch(jnp.asarray(imgs), dataset=cfg.dataset,
                             img_size=cfg.img_size)
        attn = np.asarray(model.apply(variables, x)["attn"])
        for i in range(2):
            want = attention_to_maps(attn[i], cfg.num_classes, cfg.slots_per_class)
            got = np.asarray(out["slot_maps"])[i]
            # uint8 quantization boundaries may differ by 1 between paths
            assert np.abs(got.astype(int) - want.astype(int)).max() <= 1

    def test_no_slot_model_exports_logits_only(self, tmp_path):
        cfg = small_cfg(use_slot=False)
        variables = init_variables(cfg)
        exported = export_serving(cfg, variables, batch=1)
        path = str(tmp_path / "noslot.shlo")
        save_artifact(exported, path)
        out = load_artifact(path)(probe_images(cfg, 1))
        assert set(out.keys()) == {"logits"}


class TestCLI:
    def test_export_cli_writes_verified_artifact(self, tmp_path):
        """serve.cli end-to-end: export (fresh init — no checkpoint on disk),
        save, reload, and the CLI's own artifact-vs-live parity assertion."""
        from scouter_tpu.serve.cli import main

        out = str(tmp_path / "m.shlo")
        main([
            "--dataset", "MNIST", "--model", "resnet10", "--num_classes", "3",
            "--channel", "512", "--img_size", "64", "--batch_size", "2",
            "--use_slot", "true", "--slots_per_class", "2",
            "--pre_trained", "false", "--output_dir", str(tmp_path),
            "--export_path", out, "--serve_batch", "2",
        ])
        assert os.path.getsize(out) > 1e5


class TestEngine:
    def test_futures_match_direct_batch(self):
        cfg = small_cfg()
        variables = init_variables(cfg)
        imgs = probe_images(cfg, 5, seed=3)
        with InferenceEngine(cfg, variables, buckets=(1, 4),
                             max_wait_ms=20.0) as eng:
            futs = [eng.submit(img) for img in imgs]
            got = np.stack([f.result(timeout=120)["logits"] for f in futs])
            want = eng.infer_batch(imgs)["logits"]
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
        stats = eng.stats()
        assert stats["requests"] == 5
        assert stats["batches"] >= 2  # 5 requests cannot fit one 4-bucket

    def test_pipelined_dispatch_matches_serial(self):
        """A burst through the pipelined dispatcher (max_inflight > 1) must
        resolve every future to the same logits as the serial engine — the
        resolver thread only moves the host fetch off the dispatch path."""
        cfg = small_cfg()
        variables = init_variables(cfg)
        imgs = probe_images(cfg, 12, seed=11)
        with InferenceEngine(cfg, variables, buckets=(1, 4), max_wait_ms=1.0,
                             max_inflight=4) as eng:
            futs = [eng.submit(img) for img in imgs]
            got = np.stack([f.result(timeout=120)["logits"] for f in futs])
            assert eng.stats()["requests"] == 12
        with InferenceEngine(cfg, variables, buckets=(1, 4), max_wait_ms=1.0,
                             max_inflight=1) as eng:
            futs = [eng.submit(img) for img in imgs]
            want = np.stack([f.result(timeout=120)["logits"] for f in futs])
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_bucket_padding_is_masked_out(self):
        """A 3-image batch through the 4-bucket must equal the unpadded fn."""
        cfg = small_cfg()
        variables = init_variables(cfg)
        imgs = probe_images(cfg, 3, seed=9)
        with InferenceEngine(cfg, variables, buckets=(4,)) as eng:
            out = eng.infer_batch(imgs)
        assert out["logits"].shape == (3, cfg.num_classes)
        live = jax.jit(make_serving_fn(cfg, variables))
        want = np.asarray(live(jnp.asarray(imgs))["logits"])
        np.testing.assert_allclose(out["logits"], want, rtol=1e-5, atol=1e-5)

    def test_oversize_batch_chunks_to_buckets(self):
        """infer_batch beyond the largest bucket splits into bucket-sized
        chunks (no fresh jit shapes, never-negative padding stats)."""
        cfg = small_cfg()
        variables = init_variables(cfg)
        imgs = probe_images(cfg, 7, seed=13)
        with InferenceEngine(cfg, variables, buckets=(1, 4)) as eng:
            out = eng.infer_batch(imgs)
            stats = eng.stats()
        assert out["logits"].shape == (7, cfg.num_classes)
        assert stats["batches"] == 2 and stats["padded"] == 1
        # fill histogram: one full 4-bucket, one 4-bucket carrying 3 live
        assert stats["bucket_fill"] == {"4/4": 1, "4/3": 1}
        live = jax.jit(make_serving_fn(cfg, variables))
        want = np.asarray(live(jnp.asarray(imgs))["logits"])
        np.testing.assert_allclose(out["logits"], want, rtol=1e-5, atol=1e-5)

    def test_rejects_float_and_misshaped_input(self):
        """Normalized float images must be refused, not silently truncated
        to black via a uint8 cast; wrong geometry must be refused too."""
        cfg = small_cfg()
        variables = init_variables(cfg)
        with InferenceEngine(cfg, variables, buckets=(1,)) as eng:
            with pytest.raises(TypeError):
                eng.submit(np.zeros((64, 64, 1), np.float32))
            with pytest.raises(ValueError):
                eng.submit(np.zeros((32, 32, 1), np.uint8))
            with pytest.raises(TypeError):
                eng.infer_batch(np.zeros((2, 64, 64, 1), np.float32))

    def test_cancelled_future_does_not_poison_batch(self):
        """A client-cancelled request is dropped; the rest of its batch still
        resolves with correct results."""
        cfg = small_cfg()
        variables = init_variables(cfg)
        imgs = probe_images(cfg, 3, seed=17)
        with InferenceEngine(cfg, variables, buckets=(4,),
                             max_wait_ms=300.0) as eng:
            futs = [eng.submit(img) for img in imgs]
            futs[0].cancel()  # may or may not win the race with the dispatcher
            results = []
            for f in futs[1:]:
                results.append(f.result(timeout=120)["logits"])
        live = jax.jit(make_serving_fn(cfg, variables))
        want = np.asarray(live(jnp.asarray(imgs))["logits"])
        np.testing.assert_allclose(np.stack(results), want[1:],
                                   rtol=1e-5, atol=1e-5)

    def test_mesh_sharded_engine_matches_single_device(self):
        """DP serving: the engine over the 8-device mesh must return the same
        logits as the unmeshed program (batch sharded over 'data')."""
        from scouter_tpu.parallel import make_mesh

        cfg = small_cfg()
        variables = init_variables(cfg)
        mesh = make_mesh()
        assert mesh.devices.size == 8
        imgs = probe_images(cfg, 5, seed=11)
        with InferenceEngine(cfg, variables, buckets=(8,), mesh=mesh) as eng:
            out = eng.infer_batch(imgs)
        live = jax.jit(make_serving_fn(cfg, variables))
        want = np.asarray(live(jnp.asarray(imgs))["logits"])
        np.testing.assert_allclose(out["logits"], want, rtol=1e-5, atol=1e-5)

    def test_mesh_rejects_indivisible_buckets(self):
        from scouter_tpu.parallel import make_mesh

        cfg = small_cfg()
        variables = init_variables(cfg)
        with pytest.raises(ValueError):
            InferenceEngine(cfg, variables, buckets=(4,), mesh=make_mesh())

    def test_submit_after_close_raises(self):
        cfg = small_cfg()
        variables = init_variables(cfg)
        eng = InferenceEngine(cfg, variables, buckets=(1,))
        eng.close()
        with pytest.raises(RuntimeError):
            eng.submit(probe_images(cfg, 1)[0])

    def test_multi_resolver_out_of_order_integrity(self):
        """Concurrent resolver threads may complete device batches in any
        order; every future must still carry ITS request's result. Small
        buckets + zero coalescing wait force many in-flight batches racing
        across the resolver pool, and per-image logits are checked against
        the direct computation (each random image has distinct logits, so a
        swap anywhere would be caught)."""
        cfg = small_cfg()
        variables = init_variables(cfg)
        imgs = probe_images(cfg, 24, seed=23)
        with InferenceEngine(cfg, variables, buckets=(1, 2),
                             max_wait_ms=0.5, max_inflight=8,
                             resolvers=4) as eng:
            futs = [eng.submit(img) for img in imgs]
            got = np.stack([f.result(timeout=120)["logits"] for f in futs])
            samples = eng.stage_samples()
            stats = eng.stats()
        live = jax.jit(make_serving_fn(cfg, variables))
        want = np.asarray(live(jnp.asarray(imgs))["logits"])
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
        # one stage sample per request, every stage duration non-negative
        assert len(samples) == 24 and stats["requests"] == 24
        for s in samples:
            for k in ("queue_wait", "dispatch", "inflight_wait", "fetch"):
                assert s[k] >= 0.0
            assert 1 <= s["live"] <= s["bucket"] <= 2


class TestHTTPServer:
    def test_png_gray_encoder_round_trips(self):
        """The server's minimal PNG encoder must emit spec-valid PNGs that
        decode pixel-identical via an independent decoder (PIL), across
        shapes and content."""
        import io

        from PIL import Image

        from scouter_tpu.serve.server import _png_gray

        rng = np.random.RandomState(31)
        cases = [
            np.zeros((1, 1), np.uint8),
            np.full((3, 7), 255, np.uint8),
            (np.arange(64 * 64, dtype=np.int64) % 256).astype(
                np.uint8).reshape(64, 64),
            rng.randint(0, 256, (224, 96), np.uint8),
        ]
        for arr in cases:
            back = np.asarray(Image.open(io.BytesIO(_png_gray(arr))))
            assert back.dtype == np.uint8 and back.shape == arr.shape
            np.testing.assert_array_equal(back, arr)

    def test_predict_and_health_round_trip(self):
        """HTTP layer end-to-end: PNG body -> engine -> logits JSON; maps=1
        returns one base64 PNG per class; /healthz reports stats."""
        import base64
        import io
        import json
        import threading
        import urllib.request

        from PIL import Image

        from scouter_tpu.serve.server import make_server

        cfg = small_cfg()
        variables = init_variables(cfg)
        with InferenceEngine(cfg, variables, buckets=(1, 4)) as eng:
            server = make_server(eng, cfg.img_size, 1, ("127.0.0.1", 0))
            port = server.server_address[1]
            t = threading.Thread(target=server.serve_forever, daemon=True)
            t.start()
            try:
                img = probe_images(cfg, 1)[0]
                buf = io.BytesIO()
                Image.fromarray(img[..., 0], mode="L").save(buf, "PNG")
                body = buf.getvalue()

                url = f"http://127.0.0.1:{port}/predict?maps=1"
                with urllib.request.urlopen(
                        urllib.request.Request(url, data=body, method="POST"),
                        timeout=120) as resp:
                    payload = json.loads(resp.read())
                assert len(payload["logits"]) == cfg.num_classes
                assert 0 <= payload["pred"] < cfg.num_classes
                assert len(payload["slot_maps_png"]) == cfg.num_classes
                m = Image.open(io.BytesIO(
                    base64.b64decode(payload["slot_maps_png"][0])))
                assert m.size == (2, 2)
                # parity with the direct engine path
                want = eng.infer_batch(img[None])["logits"][0]
                np.testing.assert_allclose(payload["logits"], want,
                                           rtol=1e-4, atol=1e-4)

                with urllib.request.urlopen(
                        f"http://127.0.0.1:{port}/healthz", timeout=30) as resp:
                    health = json.loads(resp.read())
                assert health["status"] == "ok"
                assert health["stats"]["requests"] >= 1

                # malformed body -> per-request 400, server stays up
                try:
                    urllib.request.urlopen(urllib.request.Request(
                        f"http://127.0.0.1:{port}/predict", data=b"junk",
                        method="POST"), timeout=30)
                    raised = False
                except urllib.error.HTTPError as e:
                    raised = e.code == 400
                assert raised
            finally:
                server.shutdown()
                server.server_close()


class TestQuant:
    """Hybrid int8 serving quantization (serve/quant.py)."""

    def test_int8_conv_matches_manual_fakequant(self):
        """The injected conv must equal explicit quantize/conv/dequantize."""
        from scouter_tpu.serve.quant import int8_conv_general_dilated

        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(2, 8, 8, 16), jnp.float32)
        w = jnp.asarray(rng.randn(1, 1, 16, 32), jnp.float32)
        got = int8_conv_general_dilated(
            x, w, (1, 1), [(0, 0), (0, 0)],
            dimension_numbers=jax.lax.conv_dimension_numbers(
                x.shape, w.shape, ("NHWC", "HWIO", "NHWC")))
        a_s = np.max(np.abs(np.asarray(x))) / 127.0
        qa = np.clip(np.round(np.asarray(x) / a_s), -127, 127)
        w_s = np.abs(np.asarray(w)).max(axis=(0, 1, 2)) / 127.0
        qw = np.clip(np.round(np.asarray(w) / w_s), -127, 127)
        want = np.einsum("bhwi,io->bhwo", qa, qw[0, 0]) * (a_s * w_s)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-4)

    def test_policy_targets_pointwise_only(self):
        from scouter_tpu.serve.quant import (QUANT_POLICIES,
                                             int8_conv_general_dilated)

        policy = QUANT_POLICIES["int8"]
        assert policy(1, 1) is int8_conv_general_dilated
        assert policy(3, 1) is None   # spatial convs stay float
        assert policy(1, 2) is None   # grouped projections stay float

    def test_quantized_serving_fn_close_to_float(self):
        """quant='int8' must rewrite at least one conv to s8xs8->s32 (visible
        in the jaxpr) and keep top-1 agreement with the float path on smooth
        probe images."""
        cfg = small_cfg()
        variables = init_variables(cfg)
        imgs = probe_images(cfg, 4, seed=5)
        f_ref = jax.jit(make_serving_fn(cfg, variables))
        f_q = jax.jit(make_serving_fn(cfg, variables, quant="int8"))
        jaxpr = str(jax.make_jaxpr(make_serving_fn(cfg, variables, quant="int8"))(imgs))
        assert "preferred_element_type=int32" in jaxpr, "no int8 conv traced"
        ref = np.asarray(f_ref(imgs)["logits"])
        q = np.asarray(f_q(imgs)["logits"])
        # PTQ noise bound: logits stay close (random-init logits are
        # near-tied, so exact argmax equality is not a meaningful check —
        # only that quantization error stays far below the logit scale)
        denom = np.maximum(np.abs(ref).max(), 1e-3)
        err = np.abs(ref - q).max() / denom
        assert err < 0.05, (err, ref, q)
        # and wherever the float top-1 margin exceeds the PTQ error, the
        # quantized path must agree on the class
        srt = np.sort(ref, axis=1)
        margin = srt[:, -1] - srt[:, -2]
        decisive = margin > 2 * np.abs(ref - q).max()
        assert np.array_equal(ref[decisive].argmax(1), q[decisive].argmax(1))

    def test_engine_accepts_quant(self):
        cfg = small_cfg()
        variables = init_variables(cfg)
        imgs = probe_images(cfg, 2, seed=7)
        with InferenceEngine(cfg, variables, buckets=(2,), max_wait_ms=5.0,
                             quant="int8") as eng:
            futs = [eng.submit(img) for img in imgs]
            out = [f.result(timeout=300) for f in futs]
        assert all(np.isfinite(o["logits"]).all() for o in out)
