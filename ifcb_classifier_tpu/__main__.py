"""`python -m ifcb_classifier_tpu TRAIN|RUN ...` — the reference's
`python neuston_net.py ...` entry point."""
from .cli import main_cli

main_cli()
