"""CLI smoke for tools/train_rl.py (the at-scale PPO driver).

Covers the driver surface itself — arg plumbing, the greedy-eval rollout's
masked returns / frozen terminal states, and the artifact schema — at toy
sizes.  Learning-signal coverage lives in test_ppo.py / test_quadrotor_env.py.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_train_rl_cli_quadrotor(tmp_path):
    out = tmp_path / "rl.json"
    proc = subprocess.run(
        [
            sys.executable, "tools/train_rl.py", "--cpu",
            "--env", "quadrotor", "--iters", "2",
            "--num-envs", "4", "--rollout", "8",
            "--out-json", str(out),
        ],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "[RL] final:" in proc.stdout
    res = json.loads(out.read_text())
    assert res["env"] == "quadrotor"
    assert res["env_steps_total"] == 2 * 4 * 8
    assert len(res["history"]) >= 1
    # greedy-eval metrics present and finite
    for k in (
        "greedy_return_mean",
        "greedy_return_p10",
        "greedy_final_goal_dist_mean",
    ):
        assert isinstance(res[k], float)
        assert res[k] == res[k]  # not NaN
