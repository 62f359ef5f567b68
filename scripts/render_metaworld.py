#!/usr/bin/env python3
"""Render rollouts of a saved policy (reference misc_scripts/render_metaworld.py).

Loads a trained policy from a run directory and rolls it out with
rendering — Meta-World/MuJoCo viewer when available, RGB frame dumps
otherwise. Host-side only.
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax  # noqa: E402

from exploring_meta_tpu.trainers.rl import build_policy  # noqa: E402
from exploring_meta_tpu.envs.factory import make_env  # noqa: E402
from exploring_meta_tpu.utils.experiment import load_params  # noqa: E402


def main():
    p = argparse.ArgumentParser(description="Render a saved policy")
    p.add_argument("path", help="run directory")
    p.add_argument("--episodes", type=int, default=3)
    p.add_argument("--out", default=None, help="dir for RGB frame dumps")
    args = p.parse_args()

    with open(os.path.join(args.path, "logger.json")) as f:
        config = json.load(f)["config"]
    env_name = config["dataset"]
    env, is_device = make_env(env_name, workers=1, seed=config["seed"],
                              max_path_length=config["max_path_length"])
    if is_device:
        raise SystemExit("rendering targets host physics envs "
                         "(AntDirection / Meta-World)")

    policy = build_policy(env, config["algo"].startswith("anil"),
                          fc_neurons=config.get("fc_neurons", 100),
                          activation=config.get("activation", "relu"))
    params = load_params(os.path.join(args.path, "model.npz"),
                         policy.init(jax.random.key(0)))

    inner = env.envs[0]
    key = jax.random.key(0)
    task = env.sample_tasks(None, 1)[0]
    inner.set_task(task)
    frames = []
    can_render = True  # headless images (no GL stack) degrade gracefully
    for ep in range(args.episodes):
        obs = inner.reset()
        total = 0.0
        for t in range(config["max_path_length"]):
            key, k = jax.random.split(key)
            action = np.asarray(policy.sample(params, k, obs[None]))[0]
            obs, rew, done, truncated, suc = inner.step(action)
            total += rew
            render = getattr(getattr(inner, "_env", inner), "render", None)
            if can_render and render is not None:
                try:
                    frame = render()
                except Exception as e:
                    print(f"rendering unavailable ({e}); reporting returns only")
                    can_render = False
                    frame = None
                if args.out is not None and frame is not None:
                    frames.append(np.asarray(frame))
            if done:
                break
        print(f"episode {ep}: return {total:.2f}")

    if args.out and frames:
        os.makedirs(args.out, exist_ok=True)
        try:  # animated GIF like the reference's renders/ artifacts
            from PIL import Image
            pil = [Image.fromarray(np.asarray(f, np.uint8)) for f in frames]
            gif = os.path.join(args.out, "rollout.gif")
            pil[0].save(gif, save_all=True, append_images=pil[1:],
                        duration=40, loop=0)
            print(f"wrote {gif} ({len(frames)} frames)")
        except Exception as e:
            for i, fr in enumerate(frames):
                np.save(os.path.join(args.out, f"frame_{i:05d}.npy"), fr)
            print(f"GIF encode failed ({e}); dumped {len(frames)} npy frames")


if __name__ == "__main__":
    main()
