"""Entry-point script safety: archive extraction must reject
path-traversal members (VERDICT r2 weak item 4 — the zip mirror of the
tar `filter="data"` fix in scripts/download_bl30k.py)."""
import importlib.util
import os
import sys
import zipfile

import pytest

SCRIPTS = os.path.join(os.path.dirname(__file__), os.pardir, "scripts")


def _load(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(SCRIPTS, f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class TestZipSanitization:
    def _make_zip(self, path, members):
        with zipfile.ZipFile(path, "w") as zf:
            for name in members:
                zf.writestr(name, b"x")

    def test_traversal_member_rejected(self, tmp_path):
        dl = _load("download_datasets")
        out = str(tmp_path / "sub" / "evil.zip")
        os.makedirs(os.path.dirname(out))
        self._make_zip(out, ["ok.txt", "../escape.txt"])
        with pytest.raises(SystemExit, match="unsafe zip member"):
            dl.fetch_and_extract("unused-gid", out)
        assert not os.path.exists(tmp_path / "escape.txt")

    def test_absolute_member_rejected(self, tmp_path):
        dl = _load("download_datasets")
        out = str(tmp_path / "abs.zip")
        self._make_zip(out, ["/tmp/abs_escape.txt"])
        with pytest.raises(SystemExit, match="unsafe zip member"):
            dl.fetch_and_extract("unused-gid", out)

    def test_safe_zip_extracts_and_cleans_up(self, tmp_path):
        dl = _load("download_datasets")
        out = str(tmp_path / "good.zip")
        self._make_zip(out, ["a/b.txt", "c.txt"])
        dl.fetch_and_extract("unused-gid", out)
        assert (tmp_path / "a" / "b.txt").read_bytes() == b"x"
        assert (tmp_path / "c.txt").exists()
        assert not os.path.exists(out)  # archive removed after extract
