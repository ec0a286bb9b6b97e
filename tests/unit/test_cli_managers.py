"""Secrets + volume staging (reference src/cli/managers/
secrets_manager.py / volume_manager.py + grafana staging,
templates_manager.py:335)."""

import os

import pytest

from archi_tpu.cli.managers import (
    SecretsManager, VolumeManager, parse_env_file,
)


def _env(tmp_path, content):
    p = tmp_path / ".env"
    p.write_text(content)
    return str(p)


def test_parse_env_file(tmp_path):
    p = _env(tmp_path, """
# comment
OPENAI_API_KEY=sk-abc
export JIRA_TOKEN='tok-1'
QUOTED="v v"
EMPTY=
NOEQ
""")
    env = parse_env_file(p)
    assert env == {"OPENAI_API_KEY": "sk-abc", "JIRA_TOKEN": "tok-1",
                   "QUOTED": "v v"}


CONFIG = {
    "services": {"chat": {"enabled": True},
                 "data_manager": {"enabled": True},
                 "mattermost": {"enabled": True},
                 "piazza": {"enabled": False}},
    "data_manager": {"sources": {"jira": {"url": "http://j"},
                                 "local_files": {"paths": []}}},
    "providers": {"openai": {"enabled": True},
                  "anthropic": {"enabled": False},
                  "local": {"mode": "echo"}},
    "pipelines": {"QAPipeline": {"models": {
        "chat_model": "openai/gpt-4o", "condense_model": "local/echo"}}},
}


def test_required_secret_derivation(tmp_path):
    sm = SecretsManager(_env(tmp_path, "X=1\n"))
    req = sm.required_for(CONFIG)
    assert "MATTERMOST_TOKEN" in req          # enabled service
    assert "PIAZZA_EMAIL" not in req          # disabled service
    assert "JIRA_TOKEN" in req                # configured source
    assert "OPENAI_API_KEY" in req        # referenced by a pipeline model
    assert "ANTHROPIC_API_KEY" not in req  # enabled-but-unreferenced: no key
    # a keyless default deploy (all providers enabled, only local/echo
    # models) must require NO provider secrets
    from archi_tpu.config.defaults import default_config
    assert not (sm.required_for(default_config())
                & {"OPENAI_API_KEY", "ANTHROPIC_API_KEY",
                   "GEMINI_API_KEY", "OPENROUTER_API_KEY"})


def test_validate_missing_secret_raises(tmp_path, monkeypatch):
    monkeypatch.delenv("MATTERMOST_TOKEN", raising=False)
    sm = SecretsManager(_env(tmp_path, "JIRA_TOKEN=t\n"))
    with pytest.raises(ValueError, match="MATTERMOST_TOKEN"):
        sm.validate({"JIRA_TOKEN", "MATTERMOST_TOKEN"})
    monkeypatch.setenv("MATTERMOST_TOKEN", "from-env")
    sm.validate({"JIRA_TOKEN", "MATTERMOST_TOKEN"})  # env counts


def test_stage_writes_0600_files_and_env_overlay(tmp_path):
    sm = SecretsManager(_env(tmp_path, "JIRA_TOKEN=tok\nOPENAI_API_KEY=sk\n"))
    sdir = str(tmp_path / "secrets")
    staged = sm.stage(sdir, {"JIRA_TOKEN", "OPENAI_API_KEY", "ABSENT"})
    assert sorted(staged) == ["JIRA_TOKEN", "OPENAI_API_KEY"]
    tok = os.path.join(sdir, "JIRA_TOKEN")
    assert open(tok).read() == "tok"
    assert oct(os.stat(tok).st_mode & 0o777) == "0o600"
    env = sm.env_for_services(sdir, staged)
    assert env["JIRA_TOKEN_FILE"] == tok


def test_volume_manager_creates_and_stages(tmp_path):
    corpus = tmp_path / "corpus"
    corpus.mkdir()
    (corpus / "a.md").write_text("hello")
    vm = VolumeManager(str(tmp_path / "dep"))
    created = vm.create_required()
    assert set(created) == {"data", "secrets", "grafana"}
    staged = vm.stage_local_files({"data_manager": {"sources": {
        "local_files": {"paths": [str(corpus)]}}}})
    assert staged and os.path.exists(os.path.join(staged[0], "a.md"))
    g = vm.stage_grafana()
    names = [os.path.basename(p) for p in g]
    assert "archi.yaml" in names and "provisioning.json" in names
    vm.remove()
    assert not os.path.isdir(vm.path("data"))


def test_deployment_prepare_wires_secrets(tmp_path, monkeypatch):
    import archi_tpu.cli.deployment as dep

    monkeypatch.setattr(dep, "DEPLOY_ROOT", str(tmp_path / "deps"))
    mgr = dep.DeploymentManager("t1")
    mgr.dir = os.path.join(str(tmp_path / "deps"), "t1")
    mgr.state_file = os.path.join(mgr.dir, "state.json")
    envf = _env(tmp_path, "MATTERMOST_TOKEN=mm\n")
    cfg = {"services": {"chat": {"enabled": True, "port": 1},
                        "data_manager": {"enabled": True, "port": 2},
                        "mattermost": {"enabled": True}},
           "data_manager": {}}
    overlay = mgr.prepare(cfg, env_file=envf)
    assert "MATTERMOST_TOKEN_FILE" in overlay
    assert os.path.isdir(os.path.join(mgr.dir, "secrets"))
    assert os.path.isdir(os.path.join(mgr.dir, "grafana", "dashboards"))
    # missing secret → hard error
    with pytest.raises(ValueError, match="MATTERMOST_TOKEN"):
        monkeypatch.delenv("MATTERMOST_TOKEN", raising=False)
        mgr.prepare(cfg, env_file=_env(tmp_path / "deps", "OTHER=1\n"))
