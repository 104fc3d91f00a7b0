import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest


@pytest.fixture(scope="session")
def spark():
    from yamlpyowl_spark.plans.session import get_spark

    spark = get_spark(cpus=8, app_name="yamlpyowl-spark-tests")
    yield spark
