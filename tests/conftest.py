from __future__ import annotations

import pytest

from lshdedup.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="lshdedup-tests", master="local[8]", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


# the three word sets of the reference's unit tests (test.h:86-92, 111-118)
M1 = "minhash is a probabilistic data structure for estimating the similarity between datasets"
M2 = "minhash is a probability data structure for estimating the similarity between documents"
M3 = "weighted minhash is a probabilistic data structure for estimating the similarity between weighted sets"


@pytest.fixture(scope="session")
def word_sets():
    return {"m1": M1, "m2": M2, "m3": M3}
