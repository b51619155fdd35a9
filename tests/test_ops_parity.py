"""Numerical parity of fdn_tip2025_tpu.ops against PyTorch semantics."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from fdn_tip2025_tpu import ops
from tests.conftest import assert_close
from tests.torch_ref import to_nchw, to_nhwc


def rand_nhwc(rng, shape, lo=-1.0, hi=1.0):
    return (rng.random(shape, dtype=np.float32) * (hi - lo) + lo)


class TestFourier:
    def test_rfft2_full(self, rng):
        x = rand_nhwc(rng, (2, 12, 10, 3))
        ref = torch.fft.rfft2(to_nchw(x), norm="backward")
        got = ops.rfft2(jnp.asarray(x))
        # ref: (B, C, H, Wf); got: (B, H, Wf, C)
        assert_close(np.asarray(got.real),
                     ref.real.numpy().transpose(0, 2, 3, 1), atol=1e-4)
        assert_close(np.asarray(got.imag),
                     ref.imag.numpy().transpose(0, 2, 3, 1), atol=1e-4)

    def test_irfft2_roundtrip(self, rng):
        x = rand_nhwc(rng, (1, 16, 24, 2))
        got = ops.irfft2(ops.rfft2(jnp.asarray(x)), s=(16, 24))
        assert_close(np.asarray(got), x, atol=1e-5)

    def test_irfft2_crop(self, rng):
        # irfft2 with s smaller than implied size (fourier_fuse quirk).
        x = rand_nhwc(rng, (1, 10, 10, 2))
        xt = to_nchw(x)
        f = torch.fft.rfft2(xt, norm="backward")
        ref = torch.fft.irfft2(f, s=(8, 8), norm="backward")
        got = ops.irfft2(ops.rfft2(jnp.asarray(x)), s=(8, 8))
        assert_close(np.asarray(got), to_nhwc(ref), atol=1e-4)

    @pytest.mark.parametrize("hw", [(16, 24), (16, 25), (15, 24), (15, 25)])
    def test_irfft2_nonhermitian_spectrum(self, rng, hw):
        # FCAFFN/FreBlock feed irfft2 MODULATED half-spectra that are not
        # the rfft of any real signal; torch.fft.irfft2 then imposes
        # hermitian symmetry implicitly. The folded half-spectrum inverse
        # (_irdft1d_half) must reproduce that convention exactly for even
        # and odd H/W (with and without a Nyquist bin).
        h, w = hw
        wf = w // 2 + 1
        re = rand_nhwc(rng, (2, h, wf, 3))
        im = rand_nhwc(rng, (2, h, wf, 3))
        spec = re + 1j * im
        ref = torch.fft.irfft2(to_nchw(spec), s=(h, w), norm="backward")
        got = ops.irfft2(jnp.asarray(spec), s=(h, w))
        assert_close(np.asarray(got), to_nhwc(ref), atol=1e-5)

    def test_replace_denormals(self):
        vals = np.array([-1e-11, 0.0, 1e-11, 1e-10, -1e-10, 0.5, -0.5],
                        dtype=np.float32)
        x = vals + 1j * vals[::-1].copy()
        xt = torch.from_numpy(vals) + 1j * torch.from_numpy(vals[::-1].copy())
        y_real = xt.real.clone()
        y_imag = xt.imag.clone()
        thr = 1e-10
        y_real[(xt.real < thr) & (xt.real > -thr)] = thr
        y_imag[(xt.imag < thr) & (xt.imag > -thr)] = thr
        got = ops.replace_denormals(jnp.asarray(x))
        assert_close(np.asarray(got.real), y_real.numpy())
        assert_close(np.asarray(got.imag), y_imag.numpy())

    def test_angle_matches_torch(self, rng):
        re = rand_nhwc(rng, (64,))
        im = rand_nhwc(rng, (64,))
        ref = torch.angle(torch.complex(torch.from_numpy(re),
                                        torch.from_numpy(im)))
        amp, ph = ops.amp_phase(jnp.asarray(re + 1j * im))
        assert_close(np.asarray(ph), ref.numpy(), atol=1e-6)

    def test_patch8_rfft_matches_torch(self, rng):
        x = rand_nhwc(rng, (2, 16, 24, 3))
        # reference path: rearrange to patches then torch rfft2
        xt = to_nchw(x)
        p = xt.reshape(2, 3, 2, 8, 3, 8).permute(0, 1, 2, 4, 3, 5)
        ref = torch.fft.rfft2(p.float(), norm="backward")
        patches = ops.patchify8(jnp.asarray(x))
        xr, xi = ops.rfft2_patch8(patches)
        # ref: (B, C, hb, wb, 8, 5) -> ours (B, hb, wb, 8, 5, C)
        ref_r = ref.real.numpy().transpose(0, 2, 3, 4, 5, 1)
        ref_i = ref.imag.numpy().transpose(0, 2, 3, 4, 5, 1)
        assert_close(np.asarray(xr), ref_r, atol=1e-4)
        assert_close(np.asarray(xi), ref_i, atol=1e-4)

    def test_patch8_roundtrip(self, rng):
        x = rand_nhwc(rng, (1, 8, 8, 4))
        p = ops.patchify8(jnp.asarray(x))
        xr, xi = ops.rfft2_patch8(p)
        back = ops.irfft2_patch8(xr, xi)
        assert_close(np.asarray(ops.unpatchify8(back)), x, atol=1e-5)

    def test_patch8_modulated_roundtrip(self, rng):
        # modulate amplitude/phase like FDFFN then invert; compare to torch
        x = rand_nhwc(rng, (1, 16, 16, 2))
        ffta = rng.random((8, 5, 2), dtype=np.float32) + 0.5
        fftp = rng.random((8, 5, 2), dtype=np.float32) - 0.5

        xt = to_nchw(x)
        p = xt.reshape(1, 2, 2, 8, 2, 8).permute(0, 1, 2, 4, 3, 5)
        fr = torch.fft.rfft2(p.float())
        thr = 1e-10
        rr, ii = fr.real.clone(), fr.imag.clone()
        rr[(fr.real < thr) & (fr.real > -thr)] = thr
        ii[(fr.imag < thr) & (fr.imag > -thr)] = thr
        fr = torch.complex(rr, ii)
        a = torch.abs(fr) * torch.from_numpy(
            ffta.transpose(2, 0, 1))[None, :, None, None]
        ph = torch.angle(fr) - torch.from_numpy(
            fftp.transpose(2, 0, 1))[None, :, None, None]
        out = torch.fft.irfft2(torch.complex(a * torch.cos(ph),
                                             a * torch.sin(ph)), s=(8, 8))
        ref = out.permute(0, 1, 2, 4, 3, 5).reshape(1, 2, 16, 16)

        pj = ops.patchify8(jnp.asarray(x))
        xr, xi = ops.rfft2_patch8(pj)
        xr, xi = ops.replace_denormals((xr, xi))
        from fdn_tip2025_tpu.ops.fourier import amp_phase_ri, polar_ri
        amp, phase = amp_phase_ri(xr, xi)
        amp = amp * jnp.asarray(ffta)
        phase = phase - jnp.asarray(fftp)
        rr2, ii2 = polar_ri(amp, phase)
        got = ops.unpatchify8(ops.irfft2_patch8(rr2, ii2))
        assert_close(np.asarray(got), to_nhwc(ref), atol=2e-4)


class TestConv:
    def test_conv2d(self, rng):
        x = rand_nhwc(rng, (2, 9, 11, 5))
        conv = torch.nn.Conv2d(5, 7, 3, stride=2, padding=1)
        ref = conv(to_nchw(x))
        w = conv.weight.detach().numpy().transpose(2, 3, 1, 0)
        b = conv.bias.detach().numpy()
        got = ops.conv2d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
                         stride=2, padding=1)
        assert_close(np.asarray(got), to_nhwc(ref), atol=1e-5)

    def test_conv2d_depthwise(self, rng):
        x = rand_nhwc(rng, (1, 8, 8, 6))
        conv = torch.nn.Conv2d(6, 6, 3, padding=1, groups=6, bias=False)
        ref = conv(to_nchw(x))
        w = conv.weight.detach().numpy().transpose(2, 3, 1, 0)
        got = ops.conv2d(jnp.asarray(x), jnp.asarray(w), None,
                         padding=1, groups=6)
        assert_close(np.asarray(got), to_nhwc(ref), atol=1e-5)

    def test_conv2d_1x1_pad1_grouped(self, rng):
        # fourier_fuse's odd Conv2d(c, c, 1, 1, padding=1, groups=c)
        x = rand_nhwc(rng, (1, 6, 6, 4))
        conv = torch.nn.Conv2d(4, 4, 1, 1, 1, groups=4)
        ref = conv(to_nchw(x))
        w = conv.weight.detach().numpy().transpose(2, 3, 1, 0)
        b = conv.bias.detach().numpy()
        got = ops.conv2d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
                         padding=1, groups=4)
        assert got.shape == (1, 8, 8, 4)
        assert_close(np.asarray(got), to_nhwc(ref), atol=1e-5)

    def test_conv_transpose2d(self, rng):
        x = rand_nhwc(rng, (1, 7, 9, 4))
        conv = torch.nn.ConvTranspose2d(4, 6, 4, stride=2, padding=1)
        ref = conv(to_nchw(x))
        # torch weight (I, O, kh, kw) -> flipped HWIO (kh, kw, I, O)
        wt = conv.weight.detach().numpy()
        w = wt.transpose(2, 3, 0, 1)[::-1, ::-1].copy()
        b = conv.bias.detach().numpy()
        got = ops.conv_transpose2d(jnp.asarray(x), jnp.asarray(w),
                                   jnp.asarray(b), stride=2, padding=1)
        assert got.shape == to_nhwc(ref).shape
        assert_close(np.asarray(got), to_nhwc(ref), atol=1e-5)

    def test_linear(self, rng):
        x = rng.random((3, 10), dtype=np.float32)
        lin = torch.nn.Linear(10, 4)
        ref = lin(torch.from_numpy(x))
        got = ops.linear(jnp.asarray(x),
                         jnp.asarray(lin.weight.detach().numpy().T),
                         jnp.asarray(lin.bias.detach().numpy()))
        assert_close(np.asarray(got), ref.detach().numpy(), atol=1e-5)


class TestNorm:
    def test_layernorm_withbias(self, rng):
        x = rand_nhwc(rng, (2, 5, 6, 8))
        xt = to_nchw(x)
        w = torch.randn(8)
        b = torch.randn(8)
        flat = xt.permute(0, 2, 3, 1)
        mu = flat.mean(-1, keepdim=True)
        var = flat.var(-1, keepdim=True, unbiased=False)
        ref = (flat - mu) / torch.sqrt(var + 1e-5) * w + b
        got = ops.layer_norm_2d(jnp.asarray(x), jnp.asarray(w.numpy()),
                                jnp.asarray(b.numpy()))
        assert_close(np.asarray(got), ref.numpy(), atol=1e-5)

    def test_layernorm_biasfree(self, rng):
        x = rand_nhwc(rng, (1, 4, 4, 6))
        xt = to_nchw(x).permute(0, 2, 3, 1)
        w = torch.randn(6)
        var = xt.var(-1, keepdim=True, unbiased=False)
        ref = xt / torch.sqrt(var + 1e-5) * w
        got = ops.layer_norm_2d(jnp.asarray(x), jnp.asarray(w.numpy()))
        assert_close(np.asarray(got), ref.numpy(), atol=1e-5)

    def test_batchnorm_inference(self, rng):
        x = rand_nhwc(rng, (2, 5, 5, 3))
        bn = torch.nn.BatchNorm2d(3).eval()
        with torch.no_grad():
            bn.running_mean.copy_(torch.randn(3))
            bn.running_var.copy_(torch.rand(3) + 0.5)
            bn.weight.copy_(torch.randn(3))
            bn.bias.copy_(torch.randn(3))
        ref = bn(to_nchw(x))
        got = ops.batch_norm_inference(
            jnp.asarray(x),
            jnp.asarray(bn.weight.detach().numpy()),
            jnp.asarray(bn.bias.detach().numpy()),
            jnp.asarray(bn.running_mean.numpy()),
            jnp.asarray(bn.running_var.numpy()))
        assert_close(np.asarray(got), to_nhwc(ref), atol=1e-5)


class TestResize:
    @pytest.mark.parametrize("scale", [0.5, 2.0])
    def test_nearest(self, rng, scale):
        x = rand_nhwc(rng, (2, 8, 12, 3))
        ref = F.interpolate(to_nchw(x), scale_factor=scale)
        got = ops.interp_nearest(jnp.asarray(x), scale)
        assert_close(np.asarray(got), to_nhwc(ref))

    def test_nearest_odd(self, rng):
        x = rand_nhwc(rng, (1, 7, 9, 2))
        ref = F.interpolate(to_nchw(x), scale_factor=0.5)
        got = ops.interp_nearest(jnp.asarray(x), 0.5)
        assert_close(np.asarray(got), to_nhwc(ref))

    @pytest.mark.parametrize("scale", [0.5, 2.0, 4.0])
    def test_bilinear(self, rng, scale):
        x = rand_nhwc(rng, (2, 8, 12, 3))
        ref = F.interpolate(to_nchw(x), scale_factor=scale, mode="bilinear",
                            align_corners=False)
        got = ops.interp_bilinear(jnp.asarray(x), scale)
        assert_close(np.asarray(got), to_nhwc(ref), atol=1e-5)

    def test_bilinear_odd_down(self, rng):
        x = rand_nhwc(rng, (1, 11, 13, 2))
        ref = F.interpolate(to_nchw(x), scale_factor=0.5, mode="bilinear",
                            align_corners=False)
        got = ops.interp_bilinear(jnp.asarray(x), 0.5)
        assert_close(np.asarray(got), to_nhwc(ref), atol=1e-5)

    def test_pixel_unshuffle(self, rng):
        x = rand_nhwc(rng, (1, 8, 8, 3))
        ref = torch.nn.PixelUnshuffle(2)(to_nchw(x))
        got = ops.pixel_unshuffle(jnp.asarray(x), 2)
        assert_close(np.asarray(got), to_nhwc(ref))

    def test_avg_pool(self, rng):
        x = rand_nhwc(rng, (1, 9, 9, 4))
        ref = torch.nn.AvgPool2d(3, stride=2, padding=1)(to_nchw(x))
        got = ops.avg_pool2d(jnp.asarray(x), 3, 2, 1)
        assert_close(np.asarray(got), to_nhwc(ref), atol=1e-5)


class TestImage:
    def test_grayscale(self, rng):
        x = rand_nhwc(rng, (2, 4, 4, 3), 0.0, 1.0)
        xt = to_nchw(x)
        w = torch.tensor([0.2989, 0.587, 0.114]).view(1, 3, 1, 1)
        ref = (xt * w).sum(1, keepdim=True)
        got = ops.grayscale(jnp.asarray(x))
        assert_close(np.asarray(got), to_nhwc(ref), atol=1e-6)

    def test_gamma(self, rng):
        x = rand_nhwc(rng, (1, 4, 4, 3), 0.0, 1.0)
        m = rand_nhwc(rng, (1, 4, 4, 3), 0.0, 0.05)
        ref = 1.0 - torch.pow(1.0 - to_nchw(x), to_nchw(m) * 40.0)
        got = ops.gamma_brighten(jnp.asarray(x), jnp.asarray(m))
        assert_close(np.asarray(got), to_nhwc(ref), atol=1e-5)

    def test_pad_to_multiple(self, rng):
        x = rand_nhwc(rng, (1, 30, 45, 3))
        ref = F.pad(to_nchw(x), (0, 3, 0, 2), mode="reflect")
        got, hw = ops.pad_to_multiple(jnp.asarray(x), 16)
        assert got.shape == (1, 32, 48, 3)
        assert_close(np.asarray(got), to_nhwc(ref))
        back = ops.unpad(got, hw)
        assert_close(np.asarray(back), x)

    def test_gelu_exact(self, rng):
        x = rand_nhwc(rng, (64,), -3, 3)
        ref = F.gelu(torch.from_numpy(x))
        got = ops.gelu(jnp.asarray(x))
        assert_close(np.asarray(got), ref.numpy(), atol=1e-6)

    def test_leaky(self, rng):
        x = rand_nhwc(rng, (64,), -3, 3)
        ref = F.leaky_relu(torch.from_numpy(x), 0.1)
        got = ops.leaky_relu(jnp.asarray(x))
        assert_close(np.asarray(got), ref.numpy(), atol=1e-6)
