"""Command-line entry points mirroring the reference's
``python -m src.main_train`` / ``python -m src.main_inference`` surface."""
