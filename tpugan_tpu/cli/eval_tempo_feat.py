"""Discriminator-feature transfer evaluation.

Equivalent of reference ``train_action/eval_tempo_feat.py`` (SURVEY.md
§3.4): load a trained temporal discriminator checkpoint, copy its sa1/sa2/
flow weights into an ActionCls classifier, freeze them (optax zero-update
mask — the functional analog of ``requires_grad=False``), train the SA
pooling + FC head with NLL loss, and report clip- and video-level accuracy
(per-video probability accumulation, reference eval_tempo_feat.py:40-78).
"""

from __future__ import annotations

import argparse
import os
from collections import defaultdict

import jax
import jax.numpy as jnp
import numpy as np
import optax



def _enable_compile_cache():
    import jax

    os.makedirs(os.path.expanduser("~/.cache/tpugan_jax"), exist_ok=True)
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/tpugan_jax"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)


def main():
    _enable_compile_cache()
    p = argparse.ArgumentParser(description="Eval temporal-D features")
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--epochs", type=int, default=60)
    p.add_argument("--batch_size", type=int, default=24)
    p.add_argument("--data_dir", type=str, default="./MSR-Action3D")
    p.add_argument("--ckpt_path", type=str, default=None,
                   help="trained fluid/action GAN checkpoint (random "
                        "features if omitted)")
    p.add_argument("--log_dir", type=str, default="./eval_dis")
    p.add_argument("--cutoff", type=float, default=2.0)
    p.add_argument("--frames_per_clip", type=int, default=3)
    p.add_argument("--num_points", type=int, default=2048)
    p.add_argument("--no_freeze", action="store_true",
                   help="train the WHOLE classifier (tower included) — the "
                        "supervised ceiling for this dataset/architecture, "
                        "against which the frozen-feature arms are read")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--synthetic_videos", type=int, default=8)
    p.add_argument("--synthetic_classes", type=int, default=3)
    p.add_argument("--synthetic_frames", type=int, default=10)
    p.add_argument("--seed", type=int, default=0)
    from tpugan_tpu.config import parse_with_preset

    opt = parse_with_preset(p, "eval_tempo_feat")

    from tpugan_tpu.config import ActionTrainConfig
    from tpugan_tpu.data import MSRAction3DDataset, action_batch_iterator
    from tpugan_tpu.data.synthetic import make_synthetic_action_dataset
    from tpugan_tpu.models import ActionCls, transfer_feature_extractor
    from tpugan_tpu.train import init_action_state, load_checkpoint
    from tpugan_tpu.utils import MetricWriter

    data_dir = opt.data_dir
    if opt.synthetic:
        data_dir = os.path.join(opt.log_dir, "synthetic_msr")
        make_synthetic_action_dataset(data_dir,
                                      num_videos=opt.synthetic_videos,
                                      frames=opt.synthetic_frames,
                                      points=3000,
                                      num_classes=opt.synthetic_classes,
                                      seed=opt.seed)

    train_ds = MSRAction3DDataset(
        data_dir, frames_per_clip=opt.frames_per_clip,
        num_points=opt.num_points, train=True, return_lowres=False,
        seed=opt.seed,
    )
    test_ds = MSRAction3DDataset(
        data_dir, frames_per_clip=opt.frames_per_clip,
        num_points=opt.num_points, train=False, return_lowres=False,
        seed=opt.seed,
    )
    num_classes = max(train_ds.num_classes, 20)
    print(f"{len(train_ds)} train clips / {len(test_ds)} test clips, "
          f"{num_classes} classes")

    key = jax.random.PRNGKey(opt.seed)
    cls = ActionCls(opt.frames_per_clip, num_classes=num_classes)
    dummy = [jnp.zeros((1, opt.num_points, 3))] * opt.frames_per_clip
    variables = jax.jit(
        lambda k, d: cls.init(k, d, opt.cutoff, False)
    )({"params": key, "dropout": key}, dummy)

    # ---- transfer trained temporal-D features
    if opt.ckpt_path:
        cfg = ActionTrainConfig(batch_size=1, num_points=64,
                                upsample_ratio=2)
        _, _, gan_state = init_action_state(cfg, jax.random.PRNGKey(1))
        gan_state = load_checkpoint(opt.ckpt_path, gan_state)
        dis_vars = {
            "params": gan_state.tempo.params,
            "batch_stats": gan_state.tempo.batch_stats,
        }
        variables = transfer_feature_extractor(variables, dis_vars)
        print("initialized feature extractor from", opt.ckpt_path)

    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    n_params = sum(a.size for a in jax.tree_util.tree_leaves(params))
    print(f"Total parameters: {n_params}")

    # ---- freeze tower (sa1/sa2/flow), train pooling + fc
    def label_fn(path_tuple, _):
        if opt.no_freeze:
            return "trainable"
        top = path_tuple[0] if path_tuple else ""
        sub = path_tuple[1] if len(path_tuple) > 1 else ""
        frozen = top == "tower" and sub in ("sa1", "sa2", "flow_module")
        return "frozen" if frozen else "trainable"

    from flax.traverse_util import flatten_dict, unflatten_dict

    flat = flatten_dict(params)
    mask = unflatten_dict(
        {k: label_fn(k, v) for k, v in flat.items()}
    )
    tx = optax.multi_transform(
        {"trainable": optax.adam(opt.lr), "frozen": optax.set_to_zero()},
        mask,
    )
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, batch_stats, opt_state, pos, labels, kdrop):
        def loss_fn(p):
            logits, updates = cls.apply(
                {"params": p, "batch_stats": batch_stats},
                [pos[i] for i in range(pos.shape[0])], opt.cutoff, True,
                mutable=["batch_stats"], rngs={"dropout": kdrop},
            )
            logp = jax.nn.log_softmax(logits)
            nll = -jnp.mean(
                jnp.take_along_axis(logp, labels[:, None], axis=1)
            )
            acc = jnp.mean(jnp.argmax(logits, -1) == labels)
            return nll, (updates["batch_stats"], acc)

        (loss, (bs, acc)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), bs, opt_state, loss, acc

    @jax.jit
    def infer(params, batch_stats, pos):
        logits = cls.apply(
            {"params": params, "batch_stats": batch_stats},
            [pos[i] for i in range(pos.shape[0])], opt.cutoff, False,
        )
        return jax.nn.softmax(logits)

    writer = MetricWriter(opt.log_dir)
    step_key = jax.random.PRNGKey(opt.seed + 7)
    steps_per_epoch = max(1, len(train_ds) // opt.batch_size)
    it = action_batch_iterator(train_ds, opt.batch_size, seed=opt.seed)
    best_acc = 0.0
    for epoch in range(opt.epochs):
        losses, accs = [], []
        for _ in range(steps_per_epoch):
            batch = next(it)
            step_key, sub = jax.random.split(step_key)
            params, batch_stats, opt_state, loss, acc = train_step(
                params, batch_stats, opt_state,
                jnp.asarray(batch["highres_pos"]),
                jnp.asarray(batch["label"]), sub,
            )
            losses.append(float(loss))
            accs.append(float(acc))

        # ---- video-level test (probability accumulation per video)
        video_prob = defaultdict(lambda: np.zeros(num_classes))
        video_label = {}
        test_it = action_batch_iterator(
            test_ds, min(opt.batch_size, max(1, len(test_ds))),
            shuffle=False, endless=False,
        )
        for batch in test_it:
            probs = np.asarray(infer(
                params, batch_stats, jnp.asarray(batch["highres_pos"])
            ))
            for b in range(probs.shape[0]):
                vid = int(batch["video_index"][b])
                video_prob[vid] += probs[b]
                video_label[vid] = int(batch["label"][b])
        correct = sum(
            int(np.argmax(video_prob[v]) == video_label[v]) for v in video_prob
        )
        video_acc = correct / max(1, len(video_prob))
        best_acc = max(best_acc, video_acc)
        print(
            f"epoch {epoch}: loss {np.mean(losses):.4f} "
            f"clip-acc {np.mean(accs):.3f} video-acc {video_acc:.3f}",
            flush=True,
        )
        writer.add(epoch, {
            "nll": np.mean(losses), "clip_acc": np.mean(accs),
            "video_acc": video_acc,
        })
    writer.close()
    print(f"Best video accuracy: {best_acc:.3f}")


if __name__ == "__main__":
    main()
