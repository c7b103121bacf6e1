"""Command-line entry points (reference L6: main_just_train_tea.py,
main_distill_mutual.py) with the same flag names."""
