"""M1 normalizer coercions + F7 CLI validation, mirroring the reference's
field-by-field tests (test_data_client_u.py:201-227, arg_parser.py:51-61)."""

import argparse

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from planet_data_analyzer_ray import corpus


def _dirty_batch():
    return pa.table(
        {
            "id": pa.array([101, 102, 103], type=pa.int64()),
            "sat_id": pa.array([7, 8, 9], type=pa.int64()),
            "provider": pa.array(["planetscope", "SKYSAT", None], type=pa.string()),
            "pixel_res": pa.array(["3.0", "0.5", "1.0"], type=pa.string()),
            "cloud_cover": pa.array([0.25, None, 0.9], type=pa.float64()),
            "clear_confidence_percent": pa.array([88, None, 12], type=pa.int32()),
            "acquired": pc.cast(
                pa.array(
                    [
                        "2022-01-01T10:00:00",
                        "2022-02-02T11:30:00",
                        "2022-03-03T00:00:00",
                    ],
                    type=pa.string(),
                ),
                pa.timestamp("s"),
            ),
        }
    )


def test_normalize_feature_fields():
    out = corpus.normalize_feature_batch(_dirty_batch())
    # id / sat_id -> str (data.py:223-224)
    assert out.column("id").to_pylist() == ["101", "102", "103"]
    assert out.column("sat_id").to_pylist() == ["7", "8", "9"]
    # provider -> .title() (data.py:226)
    assert out.column("satellite").to_pylist() == ["Planetscope", "Skysat", None]
    # pixel_res -> float (data.py:228)
    assert out.column("pixel_res").to_pylist() == [3.0, 0.5, 1.0]
    assert out.schema.field("pixel_res").type == pa.float64()
    # cloud_cover missing -> 0.0 (data.py:230-231)
    assert out.column("cloud_cover").to_pylist() == [0.25, 0.0, 0.9]
    # clear_confidence_percent missing -> 0 (data.py:232-233)
    assert out.column("clear_confidence_percent").to_pylist() == [88, 0, 12]
    assert out.schema.field("clear_confidence_percent").type == pa.int64()
    # acquired -> timestamp[us] (data.py:225)
    assert out.schema.field("time_acquired").type == pa.timestamp("us")


def _args(**kw):
    defaults = dict(start_date=None, end_date=None, cc=1.0, num_shards=None)
    defaults.update(kw)
    return argparse.Namespace(**defaults)


def test_args_validate():
    import job

    job.args_validate(_args())  # defaults pass
    job.args_validate(_args(start_date="2022-01-01", end_date="2022-06-01"))
    with pytest.raises(ValueError, match="end date"):
        job.args_validate(_args(start_date="2022-06-01", end_date="2022-01-01"))
    with pytest.raises(ValueError, match="cloud cover"):
        job.args_validate(_args(cc=1.5))
    with pytest.raises(ValueError, match="num_shards"):
        job.args_validate(_args(num_shards=0))
