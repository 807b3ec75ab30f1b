"""Single-caption serving latency through the full REST path (VERDICT r2
next #5: the reference publishes per-request `elapsed`,
AttnGAN2/eval/main.py:23-35).

Drives POST /api/v1.0/bird end-to-end — caption tokenize, text encode,
EMA 3-branch generator forward, attention-map render, PNG encode, blob
store — through the WSGI app exactly as a server would, at flagship dims
(random-init weights: pretrained checkpoints are environment-blocked).

Timing is host wall-clock around the whole request; on the CPU backend the
PNG encoder's np.asarray() inside the handler materializes every device
value, so the window is honestly fenced.  On TPU the same np.asarray fetch
is the fence.  Reports first-request (compile) and steady-state latency.

Usage: python scripts/serving_latency.py [--platform cpu] [-n 5]
"""

import argparse
import io
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--platform", default=None, choices=["cpu", "tpu"])
    p.add_argument("-n", type=int, default=5, help="timed requests")
    p.add_argument("--tmp", default="/tmp/serving_latency_store")
    p.add_argument("--map_format", default="png", choices=["png", "jpeg"],
                   help="attention-overlay payload format option")
    p.add_argument("--map_scale", type=float, default=1.0,
                   help="attention-overlay downscale option (0, 1]")
    args = p.parse_args()

    import jax
    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from sba_gan_tpu.config import cfg_from_dict
    from sba_gan_tpu.serving.app import (
        GanService, LocalDiskStore, make_wsgi_app,
    )
    from sba_gan_tpu.train import build_models, init_gan_state, make_sample_fn

    platform = jax.devices()[0].platform
    cfg = cfg_from_dict(
        {
            "TREE": {"BRANCH_NUM": 3, "BASE_SIZE": 64},
            "GAN": {"GF_DIM": 32, "DF_DIM": 64, "Z_DIM": 100, "R_NUM": 2},
            "TEXT": {"EMBEDDING_DIM": 256, "WORDS_NUM": 18},
            "JAX": {"DTYPE": "bfloat16" if platform == "tpu" else "float32"},
        }
    )
    n_words = 5450
    models = build_models(cfg, n_words)
    state = init_gan_state(cfg, models, jax.random.PRNGKey(0))
    sample = jax.jit(make_sample_fn(cfg, models))

    def sampler(ids, lens, seed):
        import jax as _jax
        fakes, atts = sample(state, ids, lens, _jax.random.PRNGKey(seed))
        return list(fakes), list(atts)

    wordtoix = {f"w{i}": i for i in range(1, 40)}
    ixtoword = {i: w for w, i in wordtoix.items()}
    events = []  # telemetry capture: per-request phase breakdown
    service = GanService(sampler, wordtoix, ixtoword, cfg.TEXT.WORDS_NUM,
                         LocalDiskStore(args.tmp), telemetry=events.append)
    app = make_wsgi_app(service)

    def request(caption):
        data = json.dumps({"caption": caption,
                           "map_format": args.map_format,
                           "map_scale": args.map_scale}).encode()
        captured = {}

        def start_response(status, headers):
            captured["status"] = status

        environ = {
            "REQUEST_METHOD": "POST",
            "PATH_INFO": "/api/v1.0/bird",
            "CONTENT_LENGTH": str(len(data)),
            "wsgi.input": io.BytesIO(data),
        }
        t0 = time.perf_counter()
        body = b"".join(app(environ, start_response))
        dt = time.perf_counter() - t0
        assert captured["status"] == "201 Created", captured
        return dt, json.loads(body)["bird"]

    cap = "w1 w2 w3 w4 w5 w6 w7 w8"
    t_first, bird = request(cap)
    lats = []
    for i in range(args.n):
        dt, bird = request(cap + f" w{10 + i}")  # new caption each time
        lats.append(dt)
    lats.sort()
    med = lats[len(lats) // 2]
    # per-phase medians over the timed (post-compile) requests
    phase_keys = sorted({k for e in events[1:] for k in e.get("phases", {})})
    phases = {}
    for k in phase_keys:
        vals = sorted(e["phases"].get(k, 0.0) for e in events[1:]
                      if "phases" in e)
        if vals:
            phases[k] = round(vals[len(vals) // 2], 4)
    print(json.dumps({
        "metric": f"serving_single_caption_latency_{platform}",
        "first_request_s": round(t_first, 3),
        "median_s": round(med, 3),
        "best_s": round(lats[0], 3),
        "n": args.n,
        "phase_medians_s": phases,
        "map_format": args.map_format,
        "map_scale": args.map_scale,
        "note": "POST /api/v1.0/bird end-to-end at flagship dims, "
                "random-init weights",
    }))


if __name__ == "__main__":
    main()
