"""Config-file catalog bootstrap (reference utils/config.py:1-181):
.pyiceberg.yaml discovery, PYICEBERG_CATALOG__* env overlays, and the
precedence chain kwargs > env > file."""

import os

import pytest

from iceberg_python_spark.catalog import load_catalog
from iceberg_python_spark.config import Config, merge_config


def _write_yaml(directory, body: str) -> None:
    (directory / ".pyiceberg.yaml").write_text(body)


@pytest.fixture()
def clean_env(monkeypatch, tmp_path):
    """Point PYICEBERG_HOME at a tmp dir and scrub any ambient
    PYICEBERG_* vars so each test starts from nothing."""
    for var in list(os.environ):
        if var.lower().startswith("pyiceberg"):
            monkeypatch.delenv(var, raising=False)
    monkeypatch.setenv("PYICEBERG_HOME", str(tmp_path))
    return tmp_path


def test_yaml_roundtrip_zero_kwargs(spark, clean_env, tmp_path):
    wh = tmp_path / "wh"
    _write_yaml(clean_env, f"catalog:\n  prod:\n    type: sqlite\n    warehouse: {wh}\n")
    cat = load_catalog("prod", spark)
    assert cat.name == "prod"
    cat.create_namespace("db")
    assert ("db",) in cat.list_namespaces()


def test_default_catalog_name(spark, clean_env, tmp_path):
    wh = tmp_path / "wh2"
    _write_yaml(
        clean_env,
        f"default-catalog: main\ncatalog:\n  main:\n    type: in-memory\n    warehouse: {wh}\n",
    )
    cat = load_catalog(None, spark)
    assert cat.name == "main"


def test_env_overrides_file(spark, clean_env, tmp_path, monkeypatch):
    wh_file, wh_env = tmp_path / "wh_file", tmp_path / "wh_env"
    _write_yaml(clean_env, f"catalog:\n  prod:\n    type: in-memory\n    warehouse: {wh_file}\n")
    monkeypatch.setenv("PYICEBERG_CATALOG__PROD__WAREHOUSE", str(wh_env))
    cat = load_catalog("prod", spark)
    assert cat.warehouse.rstrip("/") == str(wh_env)


def test_kwargs_override_env_and_file(spark, clean_env, tmp_path, monkeypatch):
    wh_file, wh_env, wh_kw = tmp_path / "a", tmp_path / "b", tmp_path / "c"
    _write_yaml(clean_env, f"catalog:\n  prod:\n    type: in-memory\n    warehouse: {wh_file}\n")
    monkeypatch.setenv("PYICEBERG_CATALOG__PROD__WAREHOUSE", str(wh_env))
    cat = load_catalog("prod", spark, warehouse=str(wh_kw))
    assert cat.warehouse.rstrip("/") == str(wh_kw)


def test_env_only_catalog_no_file(spark, clean_env, tmp_path, monkeypatch):
    wh = tmp_path / "envwh"
    monkeypatch.setenv("PYICEBERG_CATALOG__ENVCAT__TYPE", "in-memory")
    monkeypatch.setenv("PYICEBERG_CATALOG__ENVCAT__WAREHOUSE", str(wh))
    cat = load_catalog("envcat", spark)
    assert cat.name == "envcat"
    cat.create_namespace("db")
    assert ("db",) in cat.list_namespaces()


def test_env_key_normalization(clean_env, monkeypatch):
    # single underscores become dashes inside a part (DB_PATH -> db-path)
    monkeypatch.setenv("PYICEBERG_CATALOG__X__DB_PATH", "/tmp/x.db")
    conf = Config().get_catalog_config("x")
    assert conf == {"db-path": "/tmp/x.db"}


def test_first_yaml_found_wins(clean_env, tmp_path, monkeypatch):
    # PYICEBERG_HOME beats the home directory: no merging across files
    home = tmp_path / "home"
    home.mkdir()
    monkeypatch.setenv("HOME", str(home))
    _write_yaml(home, "catalog:\n  only-in-home:\n    type: sqlite\n")
    _write_yaml(clean_env, "catalog:\n  in-pyiceberg-home:\n    type: sqlite\n")
    c = Config()
    assert c.get_catalog_config("in-pyiceberg-home") is not None
    assert c.get_catalog_config("only-in-home") is None


def test_merge_config_semantics():
    lhs = {"a": {"x": 1, "y": 2}, "b": 1}
    rhs = {"a": {"y": 3}, "c": 4}
    assert merge_config(lhs, rhs) == {"a": {"x": 1, "y": 3}, "b": 1, "c": 4}


def test_known_catalogs(clean_env):
    _write_yaml(clean_env, "catalog:\n  one:\n    type: sqlite\n  two:\n    type: duckdb\n")
    assert sorted(Config().get_known_catalogs()) == ["one", "two"]
