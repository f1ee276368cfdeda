import sys
sys.path.insert(0, "/root/repo")
import os
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/ocs2_tpu_jax_cache")
import jax.numpy as jnp, numpy as np
from ocs2_tpu.models.legged_robot import interface, model
from ocs2_tpu.models.legged_robot.gait import GaitSchedule, trot_gait
from ocs2_tpu.models.legged_robot import loopshaping_mpc as lsm
from ocs2_tpu.oc.time_discretization import make_time_grid
from ocs2_tpu.solvers import sqp

gs = GaitSchedule(trot_gait(0.7)); ms = gs.mode_schedule(0.0, 1.0)
grid = make_time_grid(0.0, 1.0, 40, event_times=np.asarray(ms.event_times), mode_sequence=np.asarray(ms.mode_sequence))
params = interface.make_params(grid)
x0 = model.default_state(); u0 = model.weight_compensating_input(jnp.ones(4))

plain = interface.make_problem()
solp = jax.jit(lambda x: sqp.solve(plain, grid, x, params, us_init=jnp.tile(u0[None],(40,1)), settings=sqp.SqpSettings(max_iterations=12, integrator="rk2")))(x0)
rough_p = float(jnp.mean(jnp.sum(jnp.diff(solp.us[:,12:],axis=0)**2,axis=-1)))
print("plain rough", rough_p, "zdev", float(jnp.max(jnp.abs(solp.xs[:,8]-model.STAND_HEIGHT))))

for w in (1e-4, 1e-3, 1e-2):
    defn = lsm.anymal_loopshaping_definition(shaping_weight=w)
    problem, _ = lsm.make_loopshaping_problem(defn=defn)
    xa0 = lsm.augment_state(defn, x0, u0)
    xs_i, us_i = lsm.loopshaped_warm_start(defn, grid, x0)
    st = lsm.make_solver_settings()
    sol = jax.jit(lambda x: sqp.solve(problem, grid, x, params, xs_init=xs_i, us_init=us_i, settings=st))(xa0)
    xs_p, us_p = lsm.plant_trajectory(defn, sol.xs, sol.us)
    rough = float(jnp.mean(jnp.sum(jnp.diff(us_p[:,12:],axis=0)**2,axis=-1)))
    print("w", w, "rough", round(rough,2), "zdev", round(float(jnp.max(jnp.abs(xs_p[:,8]-model.STAND_HEIGHT))),4),
          "defect", float(sol.performance.dynamics_violation_sse), flush=True)

# y-functional comparison: filter the PLAIN solution's u through the same
# low-pass (RK2 on xi' = p(u - xi)) and compare the shaping functional.
def y_sse_of(us, defn):
    p_diag = -np.diag(np.asarray(defn.A)); g_diag = np.diag(np.asarray(defn.D))
    dt = float(grid.times[1] - grid.times[0])
    xi = np.asarray(u0).copy(); acc = 0.0
    for k in range(us.shape[0]):
        u = np.asarray(us[k])
        y = g_diag * (u - xi)
        acc += float(np.sum(y*y))
        for _ in range(2):
            h = dt/2
            k1 = p_diag*(u - xi); k2 = p_diag*(u - (xi + h*k1))
            xi = xi + h*0.5*(k1+k2)
    return acc

defn = lsm.anymal_loopshaping_definition(shaping_weight=1e-2)
problem, _ = lsm.make_loopshaping_problem(defn=defn)
xa0 = lsm.augment_state(defn, x0, u0)
xs_i, us_i = lsm.loopshaped_warm_start(defn, grid, x0)
sol = jax.jit(lambda x: sqp.solve(problem, grid, x, params, xs_init=xs_i, us_init=us_i, settings=lsm.make_solver_settings()))(xa0)
xs_p, us_p = lsm.plant_trajectory(defn, sol.xs, sol.us)
print("y_sse plain ", round(y_sse_of(np.asarray(solp.us), defn),1))
print("y_sse shaped", round(y_sse_of(np.asarray(us_p), defn),1), flush=True)
