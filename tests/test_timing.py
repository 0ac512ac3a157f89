"""PhaseTimer tests (aux subsystem, SURVEY §5.1)."""
import time

from nrenderer_tpu.utils.timing import PhaseTimer


def test_phase_accumulation():
    t = PhaseTimer()
    with t.phase("compile"):
        time.sleep(0.01)
    with t.phase("compile"):
        time.sleep(0.01)
    with t.phase("execute"):
        pass
    st = t.get("compile")
    assert st.count == 2
    assert st.total_s >= 0.02
    report = t.report()
    assert "compile" in report and "execute" in report
    t.clear()
    assert t.get("compile").count == 0


def test_manual_add():
    t = PhaseTimer()
    t.add("transfer", 1.5)
    t.add("transfer", 0.5)
    assert t.get("transfer").total_s == 2.0
