"""VAE training entry point (finetune_autoencoder parity)."""
from __future__ import annotations

import argparse
from pathlib import Path


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--config_file", required=True)
    ap.add_argument("--workdir", default=None)
    ap.add_argument("--max_steps", type=int, default=None)
    ap.add_argument("--num_epochs", type=int, default=None)
    args = ap.parse_args(argv)

    from ..parallel import dist
    from ..train import load_run_config
    from ..train.vae_loop import VaeTrainer

    dist.initialize()
    cfg = load_run_config(args.config_file)
    workdir = Path(args.workdir or cfg.get("result_path", "results")) / (
        f"{cfg.get('Task_name', 'vae')}_{cfg.get('Task_id', '0')}_vae"
    )
    trainer = VaeTrainer(cfg, workdir)
    step = trainer.fit(num_epochs=args.num_epochs, max_steps=args.max_steps)
    print(f"vae training finished at step {step}")


if __name__ == "__main__":
    main()
