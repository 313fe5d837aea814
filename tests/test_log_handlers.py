"""Log handler push/pop stack (fastpm_set/push/pop_msg_handler,
logging.c:113-120)."""

import pytest

from fastpm_tpu.diagnostics import Log


def test_push_pop_handler(capsys):
    log = Log(echo=True)
    log.info("visible %d", 1)
    seen = []
    log.push_handler(seen.append)
    log.info("captured")
    log.push_handler(Log.void_handler)
    log.info("discarded")
    log.pop_handler()
    log.info("captured too")
    log.pop_handler()
    log.info("visible 2")
    out = capsys.readouterr().out
    assert "visible 1" in out and "visible 2" in out
    assert "captured" not in out and "discarded" not in out
    assert seen == ["captured", "captured too"]
    # all lines retained for golden checks regardless of handler
    assert log.contains("discarded")
    with pytest.raises(RuntimeError):
        log.pop_handler()
