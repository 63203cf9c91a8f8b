"""Checkpoint weight-averaging (model soup) tests."""

import numpy as np
import pytest

from mmlearn_tpu.trainer import average_checkpoints


def _write_ckpts(tmp_path, trees):
    import orbax.checkpoint as ocp

    with ocp.CheckpointManager(
        str(tmp_path), options=ocp.CheckpointManagerOptions(create=True)
    ) as m:
        for t in trees:
            m.save(int(t["step"]), args=ocp.args.StandardSave(t))
        m.wait_until_finished()


@pytest.fixture()
def soup_dir(tmp_path):
    _write_ckpts(
        tmp_path,
        [
            {
                "step": 1,
                "params": {
                    "w": np.asarray([1.0, 3.0], np.float32),
                    "ids": np.asarray([7], np.int32),
                },
                "extras": {"ema": np.asarray([0.0], np.float32)},
            },
            {
                "step": 3,
                "params": {
                    "w": np.asarray([3.0, 5.0], np.float32),
                    "ids": np.asarray([9], np.int32),
                },
                "extras": {"ema": np.asarray([2.0], np.float32)},
            },
        ],
    )
    return str(tmp_path)


def test_average_checkpoints_means_float_params(soup_dir):
    soup = average_checkpoints(soup_dir)
    np.testing.assert_allclose(soup["params"]["w"], [2.0, 4.0])
    assert soup["params"]["w"].dtype == np.float32
    # non-float leaves and non-param fields come from the LAST checkpoint
    np.testing.assert_array_equal(soup["params"]["ids"], [9])
    assert int(np.asarray(soup["step"])) == 3
    np.testing.assert_allclose(soup["extras"]["ema"], [2.0])  # not averaged


def test_average_checkpoints_extras_and_step_subset(soup_dir):
    soup = average_checkpoints(soup_dir, average_extras=True)
    np.testing.assert_allclose(soup["extras"]["ema"], [1.0])
    only_first = average_checkpoints(soup_dir, steps=[1])
    np.testing.assert_allclose(only_first["params"]["w"], [1.0, 3.0])


def test_average_checkpoints_errors(soup_dir, tmp_path_factory):
    with pytest.raises(ValueError, match="not in"):
        average_checkpoints(soup_dir, steps=[2])
    empty = tmp_path_factory.mktemp("empty")
    with pytest.raises(ValueError, match="No checkpoints"):
        average_checkpoints(str(empty))
