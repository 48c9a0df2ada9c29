"""Config INI + CLI harmonization tests (no Spark needed)."""

import pytest

from saber_spark.config import CONFIG_FILENAME, SaberSparkConfig

INI = """[mode]
model_name = DICT
save_model = true

[pipeline]
lang = de
coref = true
entity_types = PRGE, DISO
salt_buckets = 16
"""


class TestConfig:
    def test_defaults(self):
        cfg = SaberSparkConfig()
        assert cfg.lang == "en" and cfg.coref is False
        assert cfg.max_sent_len == 100 and cfg.max_char_len == 25

    def test_ini_load(self, tmp_path):
        p = tmp_path / "c.ini"
        p.write_text(INI)
        cfg = SaberSparkConfig.load(str(p))
        assert cfg.model_name == "DICT"
        assert cfg.save_model is True
        assert cfg.lang == "de"
        assert cfg.coref is True
        assert cfg.entity_types == ["PRGE", "DISO"]
        assert cfg.salt_buckets == 16

    def test_cli_overrides_ini_unless_falsy(self, tmp_path):
        """Reference rule: CLI wins unless the value is None/False
        (saber/config.py:80-84)."""
        p = tmp_path / "c.ini"
        p.write_text(INI)
        cfg = SaberSparkConfig.load(str(p), cli_args={
            "lang": "fr", "coref": False, "salt_buckets": None})
        assert cfg.lang == "fr"         # CLI override
        assert cfg.coref is True        # False does NOT override
        assert cfg.salt_buckets == 16   # None does NOT override

    def test_roundtrip(self, tmp_path):
        p = tmp_path / "c.ini"
        p.write_text(INI)
        cfg = SaberSparkConfig.load(str(p))
        out_dir = str(tmp_path / "saved")
        cfg.save(out_dir)
        cfg2 = SaberSparkConfig.load(f"{out_dir}/{CONFIG_FILENAME}")
        assert cfg2 == cfg

    def test_unknown_key_rejected(self, tmp_path):
        p = tmp_path / "c.ini"
        p.write_text("[mode]\nbogus_key = 1\n")
        with pytest.raises(ValueError):
            SaberSparkConfig.load(str(p))

    def test_missing_file(self):
        with pytest.raises(FileNotFoundError):
            SaberSparkConfig.load("/nope/c.ini")
