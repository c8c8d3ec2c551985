# Root conftest so pytest puts the repo root on sys.path.
