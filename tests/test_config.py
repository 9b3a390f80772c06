"""Config loading/validation tests (reference config/config.h semantics)."""

import json

import pytest

from mygramdb_tpu.config import load_config, load_config_from_dict, RuntimeVariableManager
from mygramdb_tpu.utils.errors import ConfigError, MygramError

MINIMAL = {
    "tables": [
        {"name": "articles", "text_source": {"column": "content"}},
    ],
}


def test_minimal_config():
    cfg = load_config_from_dict(MINIMAL)
    t = cfg.tables[0]
    assert t.name == "articles"
    assert t.primary_key == "id"
    assert t.ngram_size == 2
    assert t.kanji_ngram_size == 1
    assert cfg.api.tcp.port == 11016
    assert cfg.api.default_limit == 100
    assert cfg.memory.normalize.width == "narrow"
    assert cfg.cache.enabled is True


def test_unknown_key_rejected():
    bad = {"tables": MINIMAL["tables"], "nonsense": 1}
    with pytest.raises(ConfigError, match="unknown configuration key: nonsense"):
        load_config_from_dict(bad)


def test_unknown_nested_key_rejected():
    bad = {"tables": [{"name": "t", "text_source": {"column": "c"},
                       "bogus_knob": True}]}
    with pytest.raises(ConfigError, match=r"tables\[0\].bogus_knob"):
        load_config_from_dict(bad)


def test_wrong_type_rejected():
    bad = {"tables": MINIMAL["tables"], "api": {"default_limit": "many"}}
    with pytest.raises(ConfigError, match="api.default_limit"):
        load_config_from_dict(bad)


def test_missing_tables_rejected():
    with pytest.raises(ConfigError, match="at least one table"):
        load_config_from_dict({})


def test_text_source_required():
    with pytest.raises(ConfigError, match="text_source"):
        load_config_from_dict({"tables": [{"name": "t"}]})


def test_concat_and_column_exclusive():
    with pytest.raises(ConfigError, match="exclusive"):
        load_config_from_dict({"tables": [{
            "name": "t",
            "text_source": {"column": "a", "concat": ["b", "c"]}}]})


def test_default_limit_range():
    bad = dict(MINIMAL, api={"default_limit": 4})
    with pytest.raises(ConfigError, match="5-1000"):
        load_config_from_dict(bad)


def test_invalid_filter_op():
    with pytest.raises(ConfigError, match="required_filter op"):
        load_config_from_dict({"tables": [{
            "name": "t", "text_source": {"column": "c"},
            "required_filters": [{"name": "x", "op": "~="}]}]})


def test_yaml_and_json_files(tmp_path):
    ypath = tmp_path / "c.yaml"
    ypath.write_text(
        "tables:\n  - name: articles\n    text_source:\n      column: body\n")
    cfg = load_config(str(ypath))
    assert cfg.tables[0].text_source.column == "body"

    jpath = tmp_path / "c.json"
    jpath.write_text(json.dumps(MINIMAL))
    cfg2 = load_config(str(jpath))
    assert cfg2.tables[0].name == "articles"


def test_table_lookup_qualified():
    cfg = load_config_from_dict({"tables": [
        {"name": "t1", "database": "db1", "text_source": {"column": "c"}},
        {"name": "t2", "text_source": {"column": "c"}},
    ]})
    assert cfg.table("db1.t1") is cfg.tables[0]
    assert cfg.table("t1") is cfg.tables[0]
    assert cfg.table("t2") is cfg.tables[1]
    assert cfg.table("nope") is None


class TestRuntimeVariables:
    def setup_method(self):
        self.cfg = load_config_from_dict(MINIMAL)
        self.mgr = RuntimeVariableManager(self.cfg)

    def test_set_mutable(self):
        self.mgr.set_variable("cache.enabled", "off")
        assert self.cfg.cache.enabled is False
        self.mgr.set_variable("api.default_limit", "50")
        assert self.cfg.api.default_limit == 50

    def test_set_readonly_rejected(self):
        with pytest.raises(MygramError, match="read-only"):
            self.mgr.set_variable("api.tcp.port", "9999")

    def test_set_unknown_rejected(self):
        with pytest.raises(MygramError, match="unknown variable"):
            self.mgr.set_variable("no.such.var", "1")

    def test_set_invalid_value(self):
        with pytest.raises(MygramError):
            self.mgr.set_variable("api.default_limit", "100000")

    def test_show_variables_like(self):
        rows = self.mgr.show_variables(like="cache.%")
        names = [n for n, _ in rows]
        assert "cache.enabled" in names
        assert all(n.startswith("cache.") for n in names)
        on_off = dict(rows)
        assert on_off["cache.enabled"] == "ON"

    def test_listener(self):
        seen = []
        self.mgr.add_listener(lambda n, v: seen.append((n, v)))
        self.mgr.set_variable("cache.enabled", "false")
        assert seen == [("cache.enabled", False)]
