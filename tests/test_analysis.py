import numpy as np
import pytest

from confild_tpu.analysis import metrics


class TestAccuracy:
    def test_per_channel_mse(self):
        pred = np.zeros((4, 10, 2))
        target = np.concatenate([np.ones((4, 10, 1)), 2 * np.ones((4, 10, 1))],
                                axis=-1)
        np.testing.assert_allclose(metrics.per_channel_mse(pred, target),
                                   [1.0, 4.0])

    def test_per_channel_rmae(self):
        pred = 1.5 * np.ones((3, 8, 1))
        target = np.ones((3, 8, 1))
        np.testing.assert_allclose(metrics.per_channel_rmae(pred, target),
                                   [0.5])


class TestIntegralTimescale:
    def test_known_exponential_autocorr(self):
        """OU-like process: R(lag) ~ rho^lag, integral timescale ~ dt/(1-rho)."""
        rng = np.random.default_rng(0)
        rho, n_t = 0.8, 4000
        x = np.zeros((n_t, 8, 8))
        noise = rng.normal(size=(n_t, 8, 8))
        for i in range(1, n_t):
            x[i] = rho * x[i - 1] + np.sqrt(1 - rho ** 2) * noise[i]
        dt = 0.1
        tau = metrics.integral_timescale(x, dt)
        # analytic integral of rho^lag until crossing 0.05: ~ dt*(1/(1-rho)) ~ 0.5
        assert 0.25 < tau < 0.75, tau

    def test_autocorr_lag0_is_one(self):
        rng = np.random.default_rng(1)
        ac = metrics.temporal_autocorrelation(rng.normal(size=(100, 4, 4)))
        assert np.isclose(ac[0], 1.0)
        # white noise decorrelates immediately
        assert abs(ac[1]) < 0.15

    def test_cutoff_threshold(self):
        ac = np.array([1.0, 0.5, 0.2, 0.04, 0.01])
        assert metrics.autocorr_cutoff(ac) == 3

    def test_cutoff_first_minimum(self):
        ac = np.array([1.0, 0.6, 0.4, 0.5, 0.6, 0.3])
        assert metrics.autocorr_cutoff(ac) == 2


class TestSpectra:
    def test_single_mode_spectrum(self):
        n = 128
        x = np.linspace(0, 1, n, endpoint=False)
        field = np.sin(2 * np.pi * 8 * x)[None, :].repeat(4, axis=0)
        k, e = metrics.energy_spectrum_1d(field, axis=-1, dx=1.0 / n)
        peak_k = k[np.argmax(e)]
        assert np.isclose(peak_k, 8.0)

    def test_radial_spectrum_peak(self):
        n = 64
        x = np.linspace(0, 1, n, endpoint=False)
        xx, yy = np.meshgrid(x, x, indexing="ij")
        field = np.sin(2 * np.pi * 6 * xx)[None]
        k, e = metrics.energy_spectrum_radial(field, dx=1.0 / n)
        assert abs(k[np.argmax(e)] - 6.0) < 1.5

    def test_two_point_correlation_periodic_signal(self):
        n = 64
        x = np.linspace(0, 1, n, endpoint=False)
        field = np.cos(2 * np.pi * 4 * x)[None]
        r = metrics.two_point_correlation(field)
        assert np.isclose(r[0], 1.0)
        # period n/4=16 -> correlation back to ~1 at lag 16
        assert r[16] > 0.95

    def test_spectra_relative_error_zero_for_same(self):
        rng = np.random.default_rng(2)
        f = rng.normal(size=(4, 128))
        assert metrics.spectra_relative_error(f, f) == 0.0


class TestVelocityPDF:
    def test_pdf_normalized_and_centered(self):
        from confild_tpu.analysis.metrics import velocity_pdf
        rng = np.random.default_rng(0)
        c, p = velocity_pdf(rng.normal(3.0, 2.0, size=100000))
        # standardized: density integrates to ~1, peak near 0
        assert abs(np.trapezoid(p, c) - 1.0) < 0.01
        assert abs(c[np.argmax(p)]) < 0.3

    def test_js_divergence_gates(self):
        from confild_tpu.analysis.metrics import pdf_jensen_shannon
        rng = np.random.default_rng(1)
        a = rng.normal(size=200000)
        b = rng.normal(size=200000)
        assert pdf_jensen_shannon(a, b) < 0.002       # same law ~ 0
        # standardization removes mean/scale differences...
        assert pdf_jensen_shannon(a, 5 + 3 * b) < 0.002
        # ...but not shape differences (uniform vs normal)
        u = rng.uniform(-1, 1, size=200000)
        assert pdf_jensen_shannon(a, u) > 0.05
        # symmetric
        d1, d2 = pdf_jensen_shannon(a, u), pdf_jensen_shannon(u, a)
        assert abs(d1 - d2) < 1e-12
