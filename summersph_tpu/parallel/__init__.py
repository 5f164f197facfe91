from .sharded import (make_mesh, make_sharded_prime, make_sharded_step,
                      make_sharded_run_steps,
                      sharded_run_until, pad_state_to_devices, shard_state,
                      state_specs)

__all__ = ["make_mesh", "make_sharded_prime", "make_sharded_step",
           "make_sharded_run_steps", "sharded_run_until",
           "pad_state_to_devices", "shard_state", "state_specs"]
