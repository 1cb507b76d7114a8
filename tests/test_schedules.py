"""Golden tests: O(T) cumulant recurrences vs direct O(T^2) sums, schedule
invariants, and shape/edge behavior of all schedule builders."""
import numpy as np
import pytest

from upgdm_tpu.ops import schedules as S


def brute_tilde(alpha):
    # alpha_tilde[t] = sum_{k<=t} prod_{j=k..t} a[j]  (spec of NsDiff_net.py:34-43)
    T = len(alpha)
    out = np.zeros(T)
    for t in range(T):
        s = 0.0
        for k in range(t + 1):
            s += np.prod(alpha[k : t + 1])
        out[t] = s
    return out


def brute_hat(alpha):
    # alpha_hat[t] = sum_{k<=t} a[k] * prod_{j=k..t} a[j]
    T = len(alpha)
    out = np.zeros(T)
    for t in range(T):
        s = 0.0
        for k in range(t + 1):
            s += alpha[k] * np.prod(alpha[k : t + 1])
        out[t] = s
    return out


def brute_gx(alpha):
    # gx[t] = sum_{k<=t} (1-a[k])^2 * prod_{j=k+1..t} a[j]
    T = len(alpha)
    out = np.zeros(T)
    for t in range(T):
        s = 0.0
        for k in range(t + 1):
            s += (1 - alpha[k]) ** 2 * np.prod(alpha[k + 1 : t + 1])
        out[t] = s
    return out


@pytest.mark.parametrize("schedule", ["linear", "quad", "sigmoid", "cosine", "const"])
def test_cumulants_match_brute_force(schedule):
    betas = S.make_beta_schedule(schedule, 50, 1e-4, 2e-2)
    alphas = 1.0 - betas
    tilde, hat, gx = S.nsdiff_cumulants(alphas)
    np.testing.assert_allclose(tilde, brute_tilde(alphas), rtol=1e-10)
    np.testing.assert_allclose(hat, brute_hat(alphas), rtol=1e-10)
    np.testing.assert_allclose(gx, brute_gx(alphas), rtol=1e-10)


@pytest.mark.parametrize(
    "schedule",
    ["linear", "const", "quad", "jsd", "sigmoid", "cosine", "cosine_reverse", "cosine_anneal"],
)
def test_beta_schedules_shape_and_range(schedule):
    betas = S.make_beta_schedule(schedule, 100, 1e-4, 2e-2)
    assert betas.shape == (100,)
    assert (betas > 0).all() and (betas <= 1.0).all()


def test_beta_linear_endpoints():
    betas = S.make_beta_schedule("linear", 20, 1e-4, 2e-2)
    assert betas[0] == pytest.approx(1e-4)
    assert betas[-1] == pytest.approx(2e-2)


def test_cosine_reverse_is_flip():
    b = S.make_beta_schedule("cosine", 64)
    br = S.make_beta_schedule("cosine_reverse", 64)
    np.testing.assert_allclose(br, b[::-1])


def test_nsdiff_schedule_invariants():
    for sch in ["linear", "cosine", "quad"]:
        s = S.NsDiffSchedule.create(sch, 20, 1e-4, 2e-2)
        assert s.num_timesteps == 20
        assert (s.betas_tilde >= 0).all()
        assert (s.betas_bar - s.betas_tilde >= -1e-6).all()
        # m_1 arrays are shifted with a leading 1 (NsDiff_net.py:118-123)
        assert s.betas_tilde_m_1[0] == 1.0
        assert s.betas_bar_m_1[0] == 1.0
        np.testing.assert_allclose(s.betas_tilde_m_1[1:], s.betas_tilde[:-1])
        np.testing.assert_allclose(s.alphas_cumprod_prev[1:], s.alphas_cumprod[:-1])


def test_nsdiff_cosine_guard():
    s = S.NsDiffSchedule.create("cosine", 20)
    raw = np.sqrt(1.0 - s.alphas_cumprod.astype(np.float64))
    np.testing.assert_allclose(
        s.one_minus_alphas_bar_sqrt, (raw * 0.9999).astype(np.float32), rtol=1e-4
    )


def test_card_schedule_matches_nsdiff_common_fields():
    n = S.NsDiffSchedule.create("linear", 50, 1e-4, 2e-2)
    c = S.card_schedule("linear", 50, 1e-4, 2e-2)
    np.testing.assert_allclose(n.alphas_bar_sqrt, c.alphas_bar_sqrt)
    np.testing.assert_allclose(n.posterior_variance, c.posterior_variance)


def test_diffusionts_schedule():
    s = S.diffusionts_schedule("cosine", 100)
    assert s.num_timesteps == 100
    assert (s.betas >= 0).all() and (s.betas <= 0.999).all()
    # recip identities
    np.testing.assert_allclose(
        s.sqrt_recip_alphas_cumprod * s.sqrt_alphas_cumprod, np.ones(100), rtol=1e-5
    )


def test_diffstg_schedule_one_indexed():
    s = S.diffstg_schedule(200, "linear")
    assert s.alpha.shape == (201,)
    assert s.alpha[0] == 1.0
    assert s.alphabar.shape == (201,)
    np.testing.assert_allclose(s.alphabar[1], s.alpha[1])


def test_inference_time_pairs_linear():
    pairs = S.inference_time_pairs("linear", 200, 20)
    assert len(pairs) == 20
    assert pairs[0][0] == 200
    assert pairs[-1][1] == 0
    for t1, t2 in pairs:
        assert 1 <= t1 <= 200 and 0 <= t2 <= 199 and t2 < t1


def test_ddim_time_pairs():
    pairs = S.ddim_time_pairs(100, 20)
    assert len(pairs) == 20
    assert pairs[0][0] == 99
    assert pairs[-1][1] == -1
