import pytest

from monohair_tpu.config import (Config, load_options, override_options,
                                 parse_arguments, save_options_file, set_options)


def test_parse_arguments_syntax():
    opt = parse_arguments(["--a.b.c=3", "--flag", "--off!", "--none=", "--s=hello",
                           "--lst=[1,2]"])
    assert opt.a.b.c == 3
    assert opt.flag is True
    assert opt.off is False
    assert opt.none is None
    assert opt.s == "hello"
    assert opt.lst == [1, 2]


def test_parent_inheritance(tmp_path):
    (tmp_path / "base.yaml").write_text("x: 1\nnested:\n  a: 1\n  b: 2\n")
    (tmp_path / "child.yaml").write_text(
        "_parent_: base.yaml\nx: 5\nnested:\n  b: 7\n")
    opt = load_options(str(tmp_path / "child.yaml"))
    assert opt.x == 5
    assert opt.nested.a == 1
    assert opt.nested.b == 7


def test_set_options_with_cli(tmp_path):
    (tmp_path / "case.yaml").write_text("seed: 0\nname: run\ndata:\n  case: wavy\n")
    cmd = parse_arguments([f"--yaml={tmp_path}/case", "--data.case=other"])
    opt = set_options(cmd)
    assert opt.data.case == "other"
    assert opt.seed == 0


def test_override_unknown_key_strict():
    base = Config({"a": 1})
    with pytest.raises(KeyError):
        override_options(base, {"b": 2}, allow_new=False)


def test_save_options_backup(tmp_path):
    opt = Config({"a": 1, "output_path": str(tmp_path)})
    save_options_file(opt)
    opt["a"] = 2
    save_options_file(opt)
    assert (tmp_path / "options.yaml.bak").exists()
