from vfr_tpu.data.glove import Vocab, load_glove, synthetic_glove, tokenize  # noqa: F401
from vfr_tpu.data.features import FeatureStore  # noqa: F401
from vfr_tpu.data.didemo import DidemoDataset  # noqa: F401
from vfr_tpu.data.charades import CharadesSTADataset  # noqa: F401
from vfr_tpu.data.synthetic import make_didemo_fixture, make_charades_fixture  # noqa: F401
from vfr_tpu.data.prefetch import Prefetcher, device_put_prefetch  # noqa: F401
