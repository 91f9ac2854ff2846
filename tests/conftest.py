import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


@pytest.fixture(scope="session")
def spark():
    from b2xtranslator_spark.plans.session import build_session

    spark = build_session(app_name="b2x-tests", master="local[8]")
    yield spark
    spark.stop()
