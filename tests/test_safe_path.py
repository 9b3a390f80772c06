"""Path-traversal protection for network-supplied filesystem paths
(reference utils/safe_path.h + tests/storage/dump_security_test.cpp +
admin_handler.cpp CONFIG VERIFY hardening)."""

import os

import pytest

from mygramdb_tpu.catalog import TableCatalog
from mygramdb_tpu.config import load_config_from_dict
from mygramdb_tpu.server.core import ServerCore
from mygramdb_tpu.utils.errors import MygramError
from mygramdb_tpu.utils.safe_path import resolve_safe_path

CFG = {
    "tables": [{
        "name": "articles",
        "text_source": {"column": "content"},
    }],
    "memory": {"verify_text": "all"},
}


@pytest.fixture()
def core(tmp_path):
    cfg_dict = dict(CFG)
    cfg_dict["dump"] = {"dir": str(tmp_path / "dumps"),
                        "default_filename": "t.dmp"}
    (tmp_path / "dumps").mkdir()
    cfg = load_config_from_dict(cfg_dict)
    cat = TableCatalog(cfg)
    ctx = cat.resolve("articles")
    ctx.add_row("1", "hello world", {})
    return ServerCore(cfg, cat)


class TestResolveSafePath:
    def test_relative_inside(self, tmp_path):
        got = resolve_safe_path("a.dmp", str(tmp_path))
        assert got == os.path.join(os.path.realpath(str(tmp_path)),
                                   "a.dmp")

    def test_subdir_inside(self, tmp_path):
        got = resolve_safe_path("sub/a.dmp", str(tmp_path))
        assert got.endswith(os.path.join("sub", "a.dmp"))

    def test_dotdot_escape_rejected(self, tmp_path):
        with pytest.raises(MygramError):
            resolve_safe_path("../evil.dmp", str(tmp_path))

    def test_hidden_dotdot_rejected(self, tmp_path):
        # subdir/../../ escapes even though it starts innocently
        with pytest.raises(MygramError):
            resolve_safe_path("sub/../../evil.dmp", str(tmp_path))

    def test_dotdot_collapse_inside_ok(self, tmp_path):
        # sub/../file stays inside the base: allowed after collapse
        # (matches std::filesystem canonicalization semantics)
        got = resolve_safe_path("sub/../ok.dmp", str(tmp_path))
        assert got == os.path.join(os.path.realpath(str(tmp_path)),
                                   "ok.dmp")

    def test_absolute_outside_rejected(self, tmp_path):
        with pytest.raises(MygramError):
            resolve_safe_path("/etc/passwd", str(tmp_path))

    def test_absolute_inside_ok(self, tmp_path):
        p = str(tmp_path / "x.dmp")
        assert resolve_safe_path(p, str(tmp_path)) == \
            os.path.realpath(p)

    def test_symlink_escape_rejected(self, tmp_path):
        outside = tmp_path / "outside"
        outside.mkdir()
        base = tmp_path / "base"
        base.mkdir()
        (base / "link").symlink_to(outside)
        with pytest.raises(MygramError):
            resolve_safe_path("link/evil.dmp", str(base))

    def test_empty_rejected(self, tmp_path):
        with pytest.raises(MygramError):
            resolve_safe_path("", str(tmp_path))

    def test_extension_allowed(self, tmp_path):
        resolve_safe_path("c.yaml", str(tmp_path),
                          allowed_extensions=(".yaml", ".yml"))
        resolve_safe_path("c.YML", str(tmp_path),
                          allowed_extensions=(".yaml", ".yml"))

    def test_extension_rejected(self, tmp_path):
        with pytest.raises(MygramError):
            resolve_safe_path("c.txt", str(tmp_path),
                              allowed_extensions=(".yaml", ".yml"))

    def test_prefix_sibling_rejected(self, tmp_path):
        # /base-evil must not pass a /base containment check (the classic
        # startswith-without-separator bug)
        base = tmp_path / "base"
        base.mkdir()
        evil = tmp_path / "base-evil"
        evil.mkdir()
        with pytest.raises(MygramError):
            resolve_safe_path(str(evil / "x.dmp"), str(base))


class TestDumpPathSecurity:
    """DUMP commands are network-supplied: paths confined to dump.dir
    (reference dump_security_test.cpp)."""

    def test_traversal_save_rejected(self, core):
        resp = core.handle_line("DUMP SAVE ../../evil.dmp")
        assert resp.startswith("ERROR")

    def test_absolute_outside_save_rejected(self, core):
        resp = core.handle_line("DUMP SAVE /tmp/evil.dmp")
        assert resp.startswith("ERROR")

    def test_load_traversal_rejected(self, core):
        resp = core.handle_line("DUMP LOAD ../../etc/passwd")
        assert resp.startswith("ERROR")

    def test_verify_traversal_rejected(self, core):
        resp = core.handle_line("DUMP VERIFY ../x.dmp")
        assert resp.startswith("ERROR")

    def test_manager_not_wedged_after_rejection(self, core):
        # a rejected path must not leave the busy flag set
        assert core.handle_line("DUMP SAVE ../evil.dmp").startswith("ERROR")
        resp = core.handle_line("DUMP SAVE ok.dmp")
        assert resp.startswith("OK DUMP_STARTED")
        assert core.dump_manager.wait(30)

    def test_relative_save_inside_ok(self, core):
        resp = core.handle_line("DUMP SAVE fine.dmp")
        assert resp.startswith("OK DUMP_STARTED")
        assert core.dump_manager.wait(30)


class TestConfigVerifySecurity:
    """CONFIG VERIFY hardening (reference admin_handler.cpp:126-170)."""

    def test_absolute_rejected(self, core):
        resp = core.handle_line("CONFIG VERIFY /etc/config.yaml")
        assert "absolute paths not allowed" in resp

    def test_traversal_rejected(self, core):
        resp = core.handle_line("CONFIG VERIFY ../conf.yaml")
        assert "path traversal (..) not allowed" in resp

    def test_extension_rejected(self, core):
        resp = core.handle_line("CONFIG VERIFY notes.txt")
        assert resp.startswith("ERROR")

    def test_valid_relative_yaml(self, core, tmp_path, monkeypatch):
        cfg_file = tmp_path / "good.yaml"
        cfg_file.write_text(
            "tables:\n"
            "  - name: t1\n"
            "    text_source: {column: content}\n")
        monkeypatch.chdir(tmp_path)
        assert core.handle_line("CONFIG VERIFY good.yaml") == \
            "OK CONFIG_VERIFIED"

    def test_symlink_rejected(self, core, tmp_path, monkeypatch):
        real = tmp_path / "real.yaml"
        real.write_text("tables: []\n")
        (tmp_path / "ln.yaml").symlink_to(real)
        monkeypatch.chdir(tmp_path)
        resp = core.handle_line("CONFIG VERIFY ln.yaml")
        assert "symbolic links are not allowed" in resp
