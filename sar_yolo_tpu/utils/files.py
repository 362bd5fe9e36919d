"""File/path helpers (capability parity with reference utils/files.py:
WorkingDirectory, increment_path, file_age/date/size, get_latest_run,
spaces_in_path)."""

from __future__ import annotations

import contextlib
import os
import shutil
import tempfile
from datetime import datetime
from pathlib import Path


class WorkingDirectory(contextlib.ContextDecorator):
    """`with WorkingDirectory(dir):` / `@WorkingDirectory(dir)` — chdir and restore."""

    def __init__(self, new_dir):
        self.dir = new_dir
        self.cwd = Path.cwd().resolve()

    def __enter__(self):
        os.chdir(self.dir)

    def __exit__(self, *exc):
        os.chdir(self.cwd)


@contextlib.contextmanager
def spaces_in_path(path):
    """Yield a temp copy of `path` with spaces replaced by underscores; copy any
    result back on exit (some tools break on spaced paths)."""
    path = Path(path)
    if " " not in str(path):
        yield path
        return
    with tempfile.TemporaryDirectory() as tmp:
        tmp_path = Path(tmp) / path.name.replace(" ", "_")
        if path.is_dir():
            shutil.copytree(path, tmp_path)
        elif path.is_file():
            shutil.copy2(path, tmp_path)
        try:
            yield tmp_path
        finally:
            if tmp_path.is_dir():
                shutil.copytree(tmp_path, path, dirs_exist_ok=True)
            elif tmp_path.is_file():
                shutil.copy2(tmp_path, path)


def increment_path(path, exist_ok: bool = False, sep: str = "", mkdir: bool = False) -> Path:
    """runs/exp -> runs/exp2, runs/exp3, ... unless exist_ok (reference files.py:90)."""
    path = Path(path)
    if path.exists() and not exist_ok:
        path, suffix = (path.with_suffix(""), path.suffix) if path.is_file() else (path, "")
        for n in range(2, 9999):
            p = f"{path}{sep}{n}{suffix}"
            if not os.path.exists(p):
                path = Path(p)
                break
    if mkdir:
        path.mkdir(parents=True, exist_ok=True)
    return path


def file_age(path) -> int:
    """Days since last modification."""
    dt = datetime.now() - datetime.fromtimestamp(Path(path).stat().st_mtime)
    return dt.days


def file_date(path) -> str:
    """Human-readable modification date, e.g. '2026-8-16'."""
    t = datetime.fromtimestamp(Path(path).stat().st_mtime)
    return f"{t.year}-{t.month}-{t.day}"


def file_size(path) -> float:
    """Size in MB (files and directories)."""
    path = Path(path)
    mb = 1 << 20
    if path.is_file():
        return path.stat().st_size / mb
    if path.is_dir():
        return sum(f.stat().st_size for f in path.glob("**/*") if f.is_file()) / mb
    return 0.0


def get_latest_run(search_dir: str = ".") -> str:
    """Most recent orbax 'last' checkpoint under search_dir (for resume=True).

    The reference globs **/last*.pt; our checkpoints are orbax directories named
    'last' (utils/checkpoint.py).
    """
    last = [p for p in Path(search_dir).rglob("last") if p.is_dir()]
    return str(max(last, key=os.path.getmtime)) if last else ""
