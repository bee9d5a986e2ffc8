from sgg_tpu.utils.profiling import MetricLogger, SmoothedValue


def test_smoothed_value():
    sv = SmoothedValue(window_size=3)
    for v in (1.0, 2.0, 3.0, 4.0):
        sv.update(v)
    assert sv.median == 3.0
    assert sv.avg == 3.0
    assert sv.global_avg == 2.5
    assert "3.0" in str(sv)


def test_metric_logger():
    ml = MetricLogger()
    ml.update(loss=1.0, acc=0.5)
    ml.update(loss=2.0, acc=0.6)
    s = str(ml)
    assert "loss" in s and "acc" in s
    items = list(ml.log_every(range(5), print_freq=2, header="t"))
    assert items == [0, 1, 2, 3, 4]
