"""Recipe: the multi-phase surrogate workflow orchestrator
(``bayesfast/core/recipe.py``).

OptimizeStep (fit -> Laplace -> iterate to convergence) -> SampleStep(s)
(resample fit points -> refit -> NUTS on surrogate, warm-started) -> PostStep
(importance sampling + evidence). Host-side control flow; all heavy lifting
(true-model evaluation, surrogate fits, MCMC) happens in batched device
programs. The reference's ``parallel_backend.map(density.fun, x)`` calls
become single batched ``density.fun(x)`` evaluations.
"""

from collections import namedtuple
from copy import deepcopy
import warnings

import numpy as np
from scipy.special import logsumexp

from .module import Surrogate
from .density import Density, DensityLite
from .sample import sample
from ..samplers import (SampleTrace, NTrace, TraceTuple, _get_step_size,
                        _get_metric)
from ..samplers.sample_trace import _HTrace
from ..utils import all_isinstance, Laplace, SystematicResampler
from ..utils.acor import integrated_time
from ..utils.collections import PropertyList
from ..utils.sobol import multivariate_normal

__all__ = ['OptimizeStep', 'SampleStep', 'PostStep', 'StaticSample',
           'DynamicSample', 'RecipeTrace', 'Recipe']


class _BaseStep:
    """Shared config for OptimizeStep / SampleStep (``recipe.py:35-132``)."""

    def __init__(self, surrogate_list=(), alpha_n=2, fitted=False,
                 sample_trace=None, x_0=None, reuse_metric=True):
        self.surrogate_list = surrogate_list
        self.alpha_n = alpha_n
        self.fitted = fitted
        self.sample_trace = sample_trace
        self.x_0 = x_0
        self.reuse_metric = bool(reuse_metric)

    @property
    def surrogate_list(self):
        return self._surrogate_list

    @surrogate_list.setter
    def surrogate_list(self, sl):
        if isinstance(sl, Surrogate):
            sl = [sl]
        self._surrogate_list = PropertyList(sl, self._sl_check)

    @staticmethod
    def _sl_check(sl):
        for i, s in enumerate(sl):
            if not isinstance(s, Surrogate):
                raise ValueError(f'element #{i} of surrogate_list is not a '
                                 'Surrogate')
        return sl

    @property
    def n_surrogate(self):
        return len(self._surrogate_list)

    @property
    def has_surrogate(self):
        return self.n_surrogate > 0

    @property
    def alpha_n(self):
        return self._alpha_n

    @alpha_n.setter
    def alpha_n(self, a):
        self._alpha_n = float(a)

    @property
    def n_eval(self):
        return int(self._alpha_n *
                   max(su.n_param for su in self._surrogate_list))

    @property
    def x_0(self):
        return self._x_0

    @x_0.setter
    def x_0(self, x):
        self._x_0 = None if x is None else np.atleast_2d(x).copy()

    @property
    def fitted(self):
        return self._fitted

    @fitted.setter
    def fitted(self, f):
        self._fitted = bool(f)

    @property
    def sample_trace(self):
        return self._sample_trace

    @sample_trace.setter
    def sample_trace(self, t):
        if t is None:
            t = {}
        if isinstance(t, dict):
            t = NTrace(**t)
        elif not isinstance(t, (SampleTrace, TraceTuple)):
            raise ValueError('invalid value for sample_trace.')
        self._sample_trace = t


class OptimizeStep(_BaseStep):
    """Optimization phase config (``recipe.py:135-251``)."""

    def __init__(self, surrogate_list=(), alpha_n=2., laplace=None,
                 eps_pp=0.1, eps_pq=0.1, max_iter=5, x_0=None, fitted=False,
                 run_sampling=True, sample_trace=None, reuse_metric=True):
        super().__init__(surrogate_list, alpha_n, fitted, sample_trace, x_0,
                         reuse_metric)
        self.laplace = laplace
        self.eps_pp = float(eps_pp)
        self.eps_pq = float(eps_pq)
        self.max_iter = int(max_iter)
        self.run_sampling = bool(run_sampling)
        if self.eps_pp <= 0 or self.eps_pq <= 0 or self.max_iter <= 0:
            raise ValueError('invalid OptimizeStep thresholds.')

    @property
    def laplace(self):
        return self._laplace

    @laplace.setter
    def laplace(self, lap):
        if lap is None:
            lap = {'beta': 100.}
        if isinstance(lap, dict):
            lap = Laplace(**lap)
        elif not isinstance(lap, Laplace):
            raise ValueError('invalid value for laplace.')
        self._laplace = lap


class SampleStep(_BaseStep):
    """Sampling phase config (``recipe.py:254-405``)."""

    def __init__(self, surrogate_list=(), alpha_n=2., sample_trace=None,
                 resampler=None, reuse_samples=0, reuse_step_size=True,
                 reuse_metric=True, logp_cutoff=True, alpha_min=0.75,
                 alpha_supp=1.25, x_0=None, fitted=False):
        super().__init__(surrogate_list, alpha_n, fitted, sample_trace, x_0,
                         reuse_metric)
        self.resampler = resampler
        self.reuse_samples = int(reuse_samples)
        self.reuse_step_size = bool(reuse_step_size)
        self.logp_cutoff = bool(logp_cutoff)
        self.alpha_min = float(alpha_min)
        self.alpha_supp = float(alpha_supp)
        if not 0 < self.alpha_min <= 1 or self.alpha_supp <= 0:
            raise ValueError('invalid alpha_min/alpha_supp.')

    @property
    def resampler(self):
        return self._resampler

    @resampler.setter
    def resampler(self, rs):
        if rs is None:
            rs = {}
        if isinstance(rs, dict):
            rs = SystematicResampler(**rs)
        elif not callable(rs):
            raise ValueError('invalid value for resampler.')
        self._resampler = rs

    @property
    def n_eval_min(self):
        return int(self.alpha_min * self.n_eval)


class PostStep:
    """Post-processing config (``recipe.py:408-473``)."""

    def __init__(self, n_is=0, k_trunc=0.25, evidence_method=None):
        self.n_is = int(n_is)
        self.k_trunc = float(k_trunc)
        self.evidence_method = evidence_method

    @property
    def evidence_method(self):
        return self._evidence_method

    @evidence_method.setter
    def evidence_method(self, em):
        if em is None:
            pass
        elif em in ('GBS', 'GIS', 'GHM') or isinstance(em, dict):
            from ..evidence import GBS, GIS, GHM
            if em == 'GIS':
                em = GIS()
            elif em == 'GHM':
                em = GHM()
            elif em == 'GBS':
                em = GBS()
            else:
                em = GBS(**em)
        elif hasattr(em, 'run') or callable(em):
            pass
        else:
            raise ValueError('invalid value for evidence_method.')
        self._evidence_method = em


class _SampleStrategy:
    def __init__(self):
        self._i = 0

    def update(self, sample_results):
        raise NotImplementedError('abstract method.')

    @property
    def n_step(self):
        raise NotImplementedError('abstract property.')


class StaticSample(_SampleStrategy):
    """Fixed list of SampleSteps, optionally repeated
    (``recipe.py:489-568``)."""

    def __init__(self, sample_steps=None, repeat=None, verbose=True):
        super().__init__()
        if repeat is not None:
            if not hasattr(sample_steps, '__iter__'):
                warnings.warn('repeat is ignored since sample_steps is not '
                              'iterable.', RuntimeWarning)
            else:
                try:
                    sample_steps = [x for i, x in enumerate(sample_steps)
                                    for _ in range(repeat[i])]
                except Exception:
                    warnings.warn('repeat is ignored since I failed to '
                                  'interpret it.', RuntimeWarning)
        self.sample_steps = sample_steps
        self.verbose = bool(verbose)

    @property
    def sample_steps(self):
        return self._sample_steps

    @sample_steps.setter
    def sample_steps(self, steps):
        if isinstance(steps, SampleStep):
            self._sample_steps = (deepcopy(steps),)
        elif steps is None:
            self._sample_steps = ()
        elif isinstance(steps, dict):
            self._sample_steps = (SampleStep(**deepcopy(steps)),)
        elif all_isinstance(steps, (SampleStep, dict)) and len(steps) > 0:
            built = []
            for s in steps:
                s = deepcopy(s)
                built.append(SampleStep(**s) if isinstance(s, dict) else s)
            self._sample_steps = tuple(built)
        else:
            raise ValueError('invalid value for sample_steps.')

    @property
    def n_step(self):
        return len(self._sample_steps)

    def update(self, sample_results):
        i_step = len(sample_results)
        if i_step < self.n_step:
            if self.verbose:
                print(f'\n *** StaticSample: returning the #{i_step} '
                      'SampleStep. *** \n')
            return deepcopy(self._sample_steps[i_step])
        if self.verbose:
            print(f'\n *** StaticSample: iter #{i_step}, no more SampleStep. '
                  '*** \n')
        return None


class DynamicSample(_SampleStrategy):
    """Not implemented in the reference either (``recipe.py:571-574``)."""

    def __init__(self, *args):
        raise NotImplementedError


RecipePhases = namedtuple('RecipePhases', 'optimize, sample, post')

PointDoublet = namedtuple('PointDoublet', 'x, x_trans')

DensityQuartet = namedtuple('DensityQuartet',
                            'logp, logq, logp_trans, logq_trans')

OptimizeResult = namedtuple('OptimizeResult', 'x_max, f_max, surrogate_list, '
                            'var_dicts, laplace_samples, laplace_result, '
                            'samples, sample_trace')

SampleResult = namedtuple('SampleResult', 'samples, surrogate_list, '
                          'var_dicts, sample_trace')

PostResult = namedtuple('PostResult', 'samples, weights, weights_trunc, logp, '
                        'logq, logz, logz_err, x_p, x_q, logp_p, logq_q, '
                        'trace_p, trace_q, n_call, x_max, f_max')


class RecipeTrace:
    """Phase bookkeeping for a Recipe run (``recipe.py:580-692``)."""

    def __init__(self, optimize=None, sample=None, post=None,
                 sample_repeat=None):
        if isinstance(optimize, OptimizeStep) or optimize is None:
            self._s_optimize = deepcopy(optimize)
        elif isinstance(optimize, dict):
            self._s_optimize = OptimizeStep(**deepcopy(optimize))
        else:
            raise ValueError('invalid value for optimize.')

        if isinstance(sample, _SampleStrategy):
            self._strategy = sample
        else:
            self._strategy = StaticSample(sample, sample_repeat)

        self._s_sample = []

        if post is None:
            post = {}
        if isinstance(post, PostStep):
            self._s_post = deepcopy(post)
        elif isinstance(post, dict):
            self._s_post = PostStep(**deepcopy(post))
        else:
            raise ValueError('invalid value for post.')

        self._r_optimize = []
        self._r_sample = []
        self._r_post = None

        self._n_optimize = 0 if self._s_optimize is None else 1
        self._n_sample = self._strategy.n_step
        self._n_post = 0 if self._s_post is None else 1

        self._i_optimize = 0
        self._i_sample = 0
        self._i_post = 0

    @property
    def results(self):
        return RecipePhases(tuple(self._r_optimize), tuple(self._r_sample),
                            self._r_post)

    @property
    def steps(self):
        return RecipePhases(self._s_optimize, tuple(self._s_sample),
                            self._s_post)

    @property
    def sample_strategy(self):
        return self._strategy

    @property
    def i(self):
        return RecipePhases(self._i_optimize, self._i_sample, self._i_post)

    @property
    def n(self):
        return RecipePhases(self._n_optimize, self._n_sample, self._n_post)

    @property
    def n_call(self):
        """True-model call count (``recipe.py:665-682``)."""
        if self._r_post is None:
            n = 0
            for opt in self._r_optimize:
                if len(opt.surrogate_list) > 0 and opt.var_dicts is not None:
                    n += len(opt.var_dicts)
                else:
                    raise NotImplementedError
            for sam in self._r_sample:
                if len(sam.surrogate_list) > 0 and sam.var_dicts is not None:
                    n += len(sam.var_dicts)
                else:
                    raise NotImplementedError
            return n
        return self._r_post.n_call

    @property
    def finished(self):
        return RecipePhases(self._i_optimize == self._n_optimize,
                            self._i_sample == self._n_sample,
                            self._i_post == self._n_post)


class Recipe:
    """The full surrogate-sampling workflow (``recipe.py:717-1367``)."""

    def __init__(self, density, parallel_backend=None, recipe_trace=None,
                 optimize=None, sample=None, post=None, sample_repeat=None,
                 copy_density=True):
        if not isinstance(density, (Density, DensityLite)):
            raise ValueError('density should be a Density or DensityLite.')
        self._density = deepcopy(density) if copy_density else density
        self._parallel_backend = parallel_backend  # accepted, unused (mesh)

        if recipe_trace is None:
            recipe_trace = RecipeTrace(optimize, sample, post, sample_repeat)
        elif isinstance(recipe_trace, dict):
            recipe_trace = RecipeTrace(**recipe_trace)
        elif not isinstance(recipe_trace, RecipeTrace):
            raise ValueError('recipe_trace should be a RecipeTrace or None.')
        self._recipe_trace = recipe_trace

    @property
    def density(self):
        return self._density

    @property
    def recipe_trace(self):
        return self._recipe_trace

    # ---------------- optimize phase ----------------

    def _map_fun(self, x):
        """Batched true-model evaluation (replaces the reference's process
        pool map, ``recipe.py:867-868``)."""
        vds = self.density.fun(np.asarray(x), original_space=True,
                               use_surrogate=False)
        return np.atleast_1d(vds)

    def _opt_surro(self, x_0, var_dicts):
        step = self.recipe_trace._s_optimize
        result = self.recipe_trace._r_optimize

        _logp = lambda x: float(self.density.logp(
            x, original_space=False, use_surrogate=True))
        _grad = lambda x: np.asarray(self.density.grad(
            x, original_space=False, use_surrogate=True), np.float64)
        traceable = self.density.device_logp(original_space=False,
                                             use_surrogate=True)
        x_start = self.density.from_original(x_0[0])
        laplace_result = step.laplace.run(logp=_logp, x_0=x_start, grad=_grad,
                                          traceable=traceable)

        x_trans = laplace_result.x_max
        x = self.density.to_original(x_trans)
        x_max = PointDoublet(x, x_trans)

        logp = self.density.logp(x, original_space=True, use_surrogate=False)
        logp_trans = self.density.from_original_density(density=logp, x=x)
        logq_trans = laplace_result.f_max
        logq = self.density.to_original_density(density=logq_trans, x=x)
        f_max = DensityQuartet(float(logp), float(logq), float(logp_trans),
                               float(logq_trans))

        laplace_samples = self.density.to_original(laplace_result.samples)
        surrogate_list = deepcopy(list(self.density._surrogate_list))
        result.append(OptimizeResult(
            x_max=x_max, f_max=f_max, surrogate_list=surrogate_list,
            var_dicts=var_dicts, laplace_samples=laplace_samples,
            laplace_result=laplace_result, samples=None, sample_trace=None))

    def _opt_step(self, verbose=True):
        step = self.recipe_trace._s_optimize
        result = self.recipe_trace._r_optimize
        recipe_trace = self.recipe_trace

        if step.has_surrogate:
            if isinstance(self._density, DensityLite):
                raise RuntimeError('self.density should be a Density, instead '
                                   'of DensityLite, for surrogate modeling.')
            self._density.surrogate_list = list(step._surrogate_list)

            if step.fitted:
                x_0 = (np.zeros(self.density.input_size) if step.x_0 is None
                       else step.x_0.copy())
                var_dicts = None
            else:
                if step.x_0 is None:
                    dim = self.density.input_size
                    x_0 = multivariate_normal(np.zeros(dim), np.eye(dim),
                                              step.n_eval)
                else:
                    if step.n_eval > 0:
                        if step.x_0.shape[0] < step.n_eval:
                            raise RuntimeError(
                                f'I need {step.n_eval} points to fit the '
                                'surrogate model, but you only gave me '
                                f'{step.x_0.shape[0]} points in x_0.')
                        x_0 = step.x_0[:step.n_eval].copy()
                    else:
                        x_0 = step.x_0.copy()
                var_dicts = self._map_fun(x_0)
                self.density.fit(var_dicts)
            self._opt_surro(x_0, var_dicts)
            _a = result[-1].f_max
            _pq = _a.logp_trans - _a.logq_trans
            if verbose:
                print(' OptimizeStep proceeding: iter #0 finished, while '
                      f'current logp = {_a.logp:.3f}, logp_trans = '
                      f'{_a.logp_trans:.3f}, delta_pq = {_pq:.3f}.')

            for i in range(1, step.max_iter):
                if step.n_eval <= 0:
                    raise RuntimeError('alpha_n should be positive if '
                                       'max_iter is larger than 1.')
                x_0 = result[-1].laplace_samples
                if x_0.shape[0] < step.n_eval:
                    raise RuntimeError(
                        f'I need {step.n_eval} points to fit the surrogate '
                        f'model, but I can only get {x_0.shape[0]} points '
                        'from the previous iteration.')
                x_0 = x_0[:step.n_eval].copy()
                var_dicts = self._map_fun(x_0)
                self.density.fit(var_dicts)
                self._opt_surro(x_0, var_dicts)
                _a = result[-1].f_max
                _b = result[-2].f_max
                _pp = _a.logp_trans - _b.logp_trans
                _pq = _a.logp_trans - _a.logq_trans
                if verbose:
                    print(f' OptimizeStep proceeding: iter #{i} finished, '
                          f'while current logp = {_a.logp:.3f}, logp_trans = '
                          f'{_a.logp_trans:.3f}, delta_pp = {_pp:.3f}, '
                          f'delta_pq = {_pq:.3f}.')
                if (abs(_pp) < step.eps_pp) and (abs(_pq) < step.eps_pq):
                    break
                if i == step.max_iter - 1:
                    warnings.warn('Optimization did not converge within the '
                                  'max number of iterations.', RuntimeWarning)

            # pick the iteration with max logp_trans (``recipe.py:908-920``)
            logp_trans_all = np.asarray([r.f_max.logp_trans for r in result])
            is_max = np.where(logp_trans_all == np.max(logp_trans_all))[0]
            if is_max.size == 1:
                i_max = is_max[0]
            else:
                logq_trans_all = np.asarray(
                    [r.f_max.logq_trans for r in result])
                diff_all = np.abs(logp_trans_all - logq_trans_all)
                i_max = is_max[np.argmin(diff_all[is_max])]
            result.append(result[i_max])
            if verbose:
                print(f' OptimizeStep proceeding: we will use iter #{i_max} '
                      'as it has the highest logp_trans.\n')

        else:
            if step.x_0 is None:
                dim = self.density.input_size
                if dim is None:
                    raise RuntimeError('Neither OptimizeStep.x_0 nor Density'
                                       '/DensityLite.input_size is defined.')
                x_0 = np.zeros(dim)
            else:
                x_0 = self.density.from_original(step.x_0[0])
            _logp = lambda x: float(self.density.logp(x, original_space=False))
            traceable = self.density.device_logp(original_space=False,
                                                 use_surrogate=False)
            laplace_result = step.laplace.run(logp=_logp, x_0=x_0,
                                              traceable=traceable)
            x_trans = laplace_result.x_max
            x = self.density.to_original(x_trans)
            x_max = PointDoublet(x, x_trans)
            logp_trans = laplace_result.f_max
            logp = self.density.to_original_density(density=logp_trans,
                                                    x=x_max.x)
            f_max = DensityQuartet(float(logp), None, float(logp_trans), None)
            laplace_samples = self.density.to_original(laplace_result.samples)
            result.append(OptimizeResult(
                x_max=x_max, f_max=f_max, surrogate_list=(), var_dicts=None,
                laplace_samples=laplace_samples,
                laplace_result=laplace_result, samples=None,
                sample_trace=None))

        if step.has_surrogate and step.run_sampling:
            self._opt_sample()
        recipe_trace._i_optimize = 1
        if verbose:
            print('\n ***** OptimizeStep finished. ***** \n')

    def _opt_sample(self):
        step = self.recipe_trace._s_optimize
        result = self.recipe_trace._r_optimize
        sample_trace = step.sample_trace

        if sample_trace.x_0 is None:
            sample_trace.x_0 = result[-1].laplace_samples
            sample_trace._x_0_transformed = False
        if step.reuse_metric:
            cov = result[-1].laplace_result.cov.copy()
            if isinstance(sample_trace._metric, str):
                if sample_trace._metric == 'diag':
                    sample_trace._metric = np.diag(cov)
                elif sample_trace._metric == 'full':
                    sample_trace._metric = cov

        self._density.surrogate_list = list(result[-1].surrogate_list)
        self._density.use_surrogate = True
        t = sample(self.density, sample_trace=sample_trace)
        x = t.get(flatten=True)
        result[-1] = result[-1]._replace(samples=x, sample_trace=t)
        print('\n *** Finished sampling the surrogate density defined by the '
              'selected OptimizeStep. *** \n')

    # ---------------- sample phase ----------------

    def _sam_step(self):
        steps = self.recipe_trace._s_sample
        results = self.recipe_trace._r_sample
        recipe_trace = self.recipe_trace

        i = recipe_trace._i_sample
        this_step = recipe_trace._strategy.update(results)

        while this_step is not None:
            sample_trace = this_step.sample_trace
            get_prev_step = not (i == 0 and not recipe_trace._i_optimize)
            get_prev_samples = get_prev_step or (this_step.x_0 is not None)

            prev_result = prev_step = None
            if get_prev_step:
                if i == 0:
                    prev_result = recipe_trace._r_optimize[-1]
                    prev_step = recipe_trace._s_optimize
                else:
                    prev_result = results[i - 1]
                    prev_step = steps[i - 1]

            get_prev_density = (get_prev_step and this_step.x_0 is None and
                                prev_step.sample_trace is not None)

            prev_samples = None
            prev_transformed = False
            if get_prev_samples:
                if this_step.x_0 is None:
                    if prev_result.samples is None:
                        prev_samples = Laplace.untemper_laplace_samples(
                            prev_result.laplace_result)
                        prev_transformed = True
                    else:
                        prev_samples = prev_result.samples
                        prev_transformed = False
                else:
                    prev_samples = this_step.x_0
                    prev_transformed = False

            prev_density = None
            if get_prev_density:
                prev_density = prev_result.sample_trace.get(
                    return_type='logp', flatten=True)

            if isinstance(sample_trace, _HTrace):
                if sample_trace.x_0 is None and get_prev_samples:
                    sample_trace.x_0 = prev_samples
                    sample_trace._x_0_transformed = prev_transformed
                if get_prev_step:
                    if sample_trace._step_size is None:
                        if (this_step.reuse_step_size and
                                prev_result.sample_trace is not None):
                            sample_trace._step_size = _get_step_size(
                                prev_result.sample_trace)
                    if isinstance(sample_trace._metric, str):
                        if (this_step.reuse_metric and
                                prev_result.sample_trace is not None):
                            sample_trace._metric = _get_metric(
                                prev_result.sample_trace,
                                sample_trace._metric)

            if this_step.has_surrogate:
                if not isinstance(self._density, Density):
                    raise RuntimeError('self.density should be a Density for '
                                       'surrogate modeling.')
                self._density.surrogate_list = list(this_step._surrogate_list)

                if this_step.fitted:
                    var_dicts = None
                else:
                    if not get_prev_samples:
                        raise RuntimeError('You did not give me samples to '
                                           'fit the surrogate model.')
                    if (this_step.n_eval > 0 and
                            prev_samples.shape[0] < this_step.n_eval):
                        raise RuntimeError(
                            f'I need {this_step.n_eval} points to fit the '
                            'surrogate model, but I can find at most '
                            f'{prev_samples.shape[0]} points.')
                    if i > 0 and not prev_step.has_surrogate:
                        warnings.warn(
                            'you are doing surrogate modeling after sampling '
                            'the true density. Please make sure this is what '
                            'you want.', RuntimeWarning)

                    if get_prev_density:
                        i_resample = this_step.resampler(prev_density,
                                                         this_step.n_eval)
                    else:
                        if this_step.n_eval > 0:
                            i_resample = np.arange(this_step.n_eval)
                        else:
                            i_resample = np.arange(prev_samples.shape[0])

                    x_fit = prev_samples[i_resample]
                    var_dicts = self._map_fun(x_fit)
                    var_dicts_fit = var_dicts.copy()

                    if this_step.reuse_samples:
                        for j in range(i):
                            if (j + this_step.reuse_samples >= i or
                                    this_step.reuse_samples < 0):
                                var_dicts_fit = np.concatenate(
                                    (var_dicts_fit, results[j].var_dicts))

                    if this_step.logp_cutoff and get_prev_density:
                        var_dicts, var_dicts_fit = self._logp_cutoff(
                            this_step, var_dicts, var_dicts_fit,
                            prev_samples, prev_density, i_resample)

                    self.density.fit(var_dicts_fit)

                self.density.use_surrogate = True
                t = sample(self.density, sample_trace=sample_trace)
                x = t.get(flatten=True)
                surrogate_list = deepcopy(list(
                    self._density._surrogate_list))
                results.append(SampleResult(
                    samples=x, surrogate_list=surrogate_list,
                    var_dicts=var_dicts, sample_trace=t))

            else:
                if isinstance(self._density, Density):
                    self.density.use_surrogate = False
                t = sample(self.density, sample_trace=sample_trace)
                x = t.get(flatten=True)
                results.append(SampleResult(samples=x, surrogate_list=(),
                                            var_dicts=None, sample_trace=t))

            steps.append(this_step)
            print(f'\n *** SampleStep proceeding: iter #{i} finished. *** \n')
            recipe_trace._i_sample += 1
            i = recipe_trace._i_sample
            this_step = recipe_trace._strategy.update(results)

        print('\n ***** SampleStep finished. ***** \n')

    def _logp_cutoff(self, this_step, var_dicts, var_dicts_fit, prev_samples,
                     prev_density, i_resample):
        """Drop fit points with logp < min(logq) and supplement
        (``recipe.py:1097-1155``)."""
        logp_fit = np.concatenate(
            [np.atleast_1d(vd.fun[self.density.density_name])
             for vd in var_dicts_fit])
        logq_fit = prev_density[i_resample]
        logq_min = np.min(logq_fit)

        is_good = logp_fit > logq_min
        n_good = np.sum(is_good)
        f_good = n_good / logp_fit.size
        if f_good < 0.5:
            warnings.warn('more than half of the samples are abandoned '
                          'because their logp < logq_min.', RuntimeWarning)
        if f_good == 0.:
            raise RuntimeError(
                'f_good is 0, indicating that the samples seem very bad. '
                'Please check your recipe setup. You may also want to try '
                'logp_cutoff=False for the SampleStep.')

        var_dicts_fit = var_dicts_fit[is_good]
        while len(var_dicts_fit) < this_step.n_eval_min:
            n_eval_supp = ((this_step.n_eval_min - len(var_dicts_fit)) /
                           f_good * this_step.alpha_supp)
            n_eval_supp = max(int(n_eval_supp), 4)
            if prev_samples.shape[0] < n_eval_supp:
                raise RuntimeError('I do not have enough supplementary '
                                   'points.')
            i_resample = this_step.resampler(prev_density, n_eval_supp)
            x_fit = prev_samples[i_resample]
            var_dicts_supp = self._map_fun(x_fit)
            logp_supp = np.concatenate(
                [np.atleast_1d(vd.fun[self.density.density_name])
                 for vd in var_dicts_supp])
            is_good = logp_supp > logq_min
            n_good = np.sum(is_good)
            if n_good < logp_supp.size / 2:
                warnings.warn('more than half of the samples are abandoned '
                              'because their logp < logq_min.',
                              RuntimeWarning)
            var_dicts = np.concatenate((var_dicts, var_dicts_supp))
            var_dicts_fit = np.concatenate(
                (var_dicts_fit, var_dicts_supp[is_good]))
        return var_dicts, var_dicts_fit

    # ---------------- post phase ----------------

    def _pos_step(self):
        step = self.recipe_trace._s_post
        recipe_trace = self.recipe_trace

        x_p = x_q = logp_p = logq_q = None
        x_max = f_max = None
        samples = weights = weights_trunc = logp = logq = None
        trace_p = trace_q = None
        logz = logz_err = None

        if recipe_trace._i_optimize:
            opt_result = recipe_trace._r_optimize[-1]
            x_max = opt_result.x_max
            f_max = opt_result.f_max

        if recipe_trace._i_sample:
            prev_step = recipe_trace._s_sample[-1]
            prev_result = recipe_trace._r_sample[-1]
            if prev_step.has_surrogate:
                trace_q = prev_result.sample_trace
                x_q = trace_q.get(return_type='samples', flatten=False)
                logq_q = trace_q.get(return_type='logp', flatten=False)
                self.density.surrogate_list = list(prev_step.surrogate_list)
            else:
                trace_p = prev_result.sample_trace
                x_p = trace_p.get(return_type='samples', flatten=False)
                logp_p = trace_p.get(return_type='logp', flatten=False)
        elif recipe_trace._i_optimize:
            prev_step = recipe_trace._s_optimize
            prev_result = recipe_trace._r_optimize[-1]
            if (prev_step.has_surrogate and
                    prev_result.sample_trace is not None):
                trace_q = prev_result.sample_trace
                x_q = trace_q.get(return_type='samples', flatten=False)
                logq_q = trace_q.get(return_type='logp', flatten=False)
                self.density.surrogate_list = list(prev_step.surrogate_list)
            else:
                warnings.warn('no existing samples found.', RuntimeWarning)
        else:
            raise RuntimeError('you have run neither OptimizeStep nor '
                               'SampleStep before the PostStep.')

        n_is_used = 0
        if x_p is not None:
            samples = x_p.reshape((-1, x_p.shape[-1]))
            weights = np.ones(samples.shape[0])
            weights_trunc = weights
            logp = logp_p.reshape(-1)
            if step.evidence_method is not None:
                logz, logz_err = step.evidence_method.run(
                    x_p=trace_p, logp=self._f_logp, logp_p=logp_p)
            if step.n_is > 0:
                warnings.warn('n_is will not be used when we already have '
                              'exact samples from logp.', RuntimeWarning)

        elif x_q is not None:
            samples = x_q.reshape((-1, x_q.shape[-1]))
            logq = logq_q.reshape(-1)

            if step.n_is != 0:
                if step.n_is < 0 or step.n_is > samples.shape[0]:
                    if step.n_is > 0:
                        warnings.warn(
                            f'you set n_is as {step.n_is}, but I can only '
                            f'get {samples.shape[0]} samples from the '
                            'previous step, so I will use all these samples '
                            'to do IS for now.', RuntimeWarning)
                    n_is = samples.shape[0]
                else:
                    n_is = step.n_is
                    stride = int(samples.shape[0] / n_is)
                    samples = samples[::stride][:n_is]
                    logq = logq[::stride][:n_is]

                n_is_used = samples.shape[0]
                logp = np.asarray(self.density.logp(
                    samples, original_space=True,
                    use_surrogate=False)).reshape(-1)
                weights = np.exp(logp - logq)
                if step.k_trunc < 0:
                    weights_trunc = weights.copy()
                else:
                    weights_trunc = np.clip(weights, 0, np.mean(weights) *
                                            n_is ** step.k_trunc)

                if step.evidence_method is not None:
                    logz_q, logz_err_q = step.evidence_method.run(
                        x_p=trace_q, logp=self._f_logq, logp_p=logq_q)
                    logz_pq = logsumexp(logp - logq, b=1 / logp.size)
                    foo = np.exp(logp - logq - logz_pq)
                    tau = float(integrated_time(foo, quiet=True))
                    logz_err_pq = (np.var(foo) / np.mean(foo) ** 2 /
                                   logp.size * tau) ** 0.5
                    logz = logz_q + logz_pq
                    logz_err = (logz_err_q ** 2 + logz_err_pq ** 2) ** 0.5
            else:
                weights = np.ones(samples.shape[0])
                weights_trunc = weights
                if step.evidence_method is not None:
                    warnings.warn('since n_is is 0, we are computing the '
                                  'evidence of logq, which may differ from '
                                  'the evidence of logp.', RuntimeWarning)
                    logz, logz_err = step.evidence_method.run(
                        x_p=trace_q, logp=self._f_logq, logp_p=logq_q)
        else:
            if step.n_is or step.evidence_method is not None:
                warnings.warn('n_is and evidence_method will not be used '
                              'when we only have Laplace samples.',
                              RuntimeWarning)

        try:
            n_call = recipe_trace.n_call + n_is_used
        except Exception:
            n_call = None
        recipe_trace._r_post = PostResult(
            samples, weights, weights_trunc, logp, logq, logz, logz_err, x_p,
            x_q, logp_p, logq_q, trace_p, trace_q, n_call, x_max, f_max)
        recipe_trace._i_post = 1
        print('\n ***** PostStep finished. ***** \n')

    def _f_logp(self, x):
        return self.density.logp(x, original_space=True, use_surrogate=False)

    def _f_logq(self, x):
        return self.density.logp(x, original_space=True, use_surrogate=True)

    def run(self):
        """Run all remaining phases (re-entrant, ``recipe.py:1345-1353``)."""
        f_opt, f_sam, f_pos = self.recipe_trace.finished
        if not f_opt:
            self._opt_step()
        if not f_sam:
            self._sam_step()
        if not f_pos:
            self._pos_step()

    def get(self):
        """Return the PostResult of the Recipe."""
        if self.recipe_trace._r_post is None:
            raise RuntimeError('you have not run a PostStep.')
        return self.recipe_trace._r_post

    def save(self, path):
        """Checkpoint the Recipe (all phase results + sampler carries).

        Requires the density's callables to be picklable (module-level
        functions, not lambdas) — the same constraint the reference has for
        shipping densities to worker processes. ``run()`` on the loaded
        Recipe resumes at the next unfinished phase.
        """
        from ..utils.checkpoint import save as _save
        _save(self, path)

    @staticmethod
    def load(path):
        from ..utils.checkpoint import load as _load
        return _load(path)
