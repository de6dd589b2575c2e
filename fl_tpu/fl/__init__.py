"""Federated-learning core: partitioning, vmapped local training, FedAvg
aggregation, convergence detection, differential privacy, compression.

Parity targets: src/aggregation/ (fedavg.py, convergence.py) and
src/shared/ (privacy.py, privacy_config.py, compression.py, training.py,
data_loader.py partitioning).
"""

from fl_tpu.fl.accounting import (  # noqa: F401
    RDPAccountant,
    calibrate_noise_multiplier,
    compute_epsilon,
)
from fl_tpu.fl.pld import (  # noqa: F401
    PLDAccountant,
    analytic_gaussian_epsilon,
    calibrate_noise_multiplier_pld,
    compute_epsilon_pld,
)
from fl_tpu.fl.compression import (  # noqa: F401
    ModelCompressionService,
    create_compression_service,
)
from fl_tpu.fl.convergence import (  # noqa: F401
    AdaptiveConvergenceDetector,
    ConvergenceDetector,
)
from fl_tpu.fl.fedavg import (  # noqa: F401
    AdaptiveFedAvg,
    FedAvgAggregator,
    create_fedavg_aggregator,
    fedavg_delta,
    fedavg_stacked,
    fednova_effective_steps,
)
from fl_tpu.fl.local_training import (  # noqa: F401
    FederatedTrainingConfig,
    create_adaptive_config,
    make_eval_fn,
    make_local_train_fn,
)
from fl_tpu.fl.partition import DataPartitioner, partition_indices  # noqa: F401
from fl_tpu.fl.clustered import (  # noqa: F401
    ClusteredConfig,
    ClusteredFederatedEngine,
)
from fl_tpu.fl.async_fl import (  # noqa: F401
    AsyncConfig,
    AsyncFederatedEngine,
)
from fl_tpu.fl.feddf import (  # noqa: F401
    FedDFConfig,
    FedDFEngine,
)
from fl_tpu.fl.hpo import (  # noqa: F401
    FederatedHPOEngine,
    HPOConfig,
)
from fl_tpu.fl.hierarchical import (  # noqa: F401
    HierarchicalConfig,
    HierarchicalFederatedEngine,
)
from fl_tpu.fl.decentralized import (  # noqa: F401
    DecentralizedConfig,
    DecentralizedFederatedEngine,
    metropolis_mixing_matrix,
    ring_mixing_matrix,
)
from fl_tpu.fl.privacy import (  # noqa: F401
    DifferentialPrivacyEngine,
    PrivacyAccountant,
    PrivacyBudgetTracker,
    create_privacy_engine,
    make_dp_sgd_grad_fn,
    make_ghost_dp_sgd_grad_fn,
    model_supports_ghost_dp,
)
from fl_tpu.fl.personalization import (  # noqa: F401
    evaluate_personalization,
    make_personalization_fn,
)
from fl_tpu.fl.federated_eval import (  # noqa: F401
    evaluate_federated,
    make_federated_eval_fn,
)
from fl_tpu.fl.ditto import DittoPersonalizer  # noqa: F401
from fl_tpu.fl.dp_ftrl import (  # noqa: F401
    calibrate_noise_multiplier,
    gaussian_epsilon,
    rotation_mask,
    tree_height,
)
from fl_tpu.fl.scaffold import (  # noqa: F401
    scaffold_correction,
    scaffold_update,
)
from fl_tpu.fl.feddyn import feddyn_server_update  # noqa: F401
from fl_tpu.fl.qffl import qffl_combine  # noqa: F401
from fl_tpu.fl.privacy_config import (  # noqa: F401
    PrivacyConfigManager,
    PrivacyLevel,
)
from fl_tpu.fl.robust_agg import (  # noqa: F401
    ROBUST_AGGREGATORS,
    krum_matrix,
    median_matrix,
    robust_combine_deltas,
    trimmed_mean_matrix,
)
from fl_tpu.fl.analytics import (  # noqa: F401
    RandomizedResponse,
    dp_histogram,
    dp_quantiles,
    heavy_hitters,
)
from fl_tpu.fl.vertical import (  # noqa: F401
    VerticalConfig,
    VerticalFLEngine,
    split_features,
)
from fl_tpu.fl.peft import (  # noqa: F401
    LoRADense,
    count_trainable,
    lora_trainable_patterns,
    merge_lora,
    trainable_mask,
)
from fl_tpu.fl.distributed_dp import (  # noqa: F401
    DistributedDPPlan,
    distributed_epsilon,
    masked_integer_payloads,
    skellam_rdp,
)
from fl_tpu.fl.secure_agg import (  # noqa: F401
    ring_pair_masks,
    secure_fedavg_delta,
)
from fl_tpu.fl.server_optimizer import (  # noqa: F401
    SERVER_OPTIMIZERS,
    make_server_optimizer,
    make_server_update_fn,
)
