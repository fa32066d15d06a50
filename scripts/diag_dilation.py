"""Diagnose the ~1.6% acoustic dilation: measure peak-scale ratio vs the
CAMB oracle and cross-check every length in the chain (r_s, chi_*, theta_*)
between the thermo module and the perturbation-grid dynamics."""
import os, sys, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np
import jax.numpy as jnp

from cosmomc_tpu.models.background import BackgroundParams, hubble_mpc
from cosmomc_tpu.models.cmb import compute_transfers, cls_from_transfers, source_k_grid
from cosmomc_tpu.models.lensing import lens_cls
from cosmomc_tpu.models.primordial import PrimordialParams
from cosmomc_tpu.models.recfast import compute_thermo
from cosmomc_tpu.models.thermo import compute_thermo_tables, thermo_derived
from cosmomc_tpu.models.perturbations import _grho_terms, _conformal_time_table
from cosmomc_tpu.params.parameterizations import mnu_to_omnuh2

bg = BackgroundParams(
    ombh2=jnp.float64(0.02237737), omch2=jnp.float64(0.1201035),
    H0=jnp.float64(67.32178), omk=jnp.float64(0.0),
    omnuh2=jnp.float64(mnu_to_omnuh2(0.06)), nnu=jnp.float64(3.046),
    w=jnp.float64(-1.0), wa=jnp.float64(0.0), tcmb=jnp.float64(2.7255),
    num_massive_nu=1)
pp = PrimordialParams.make(logA=3.0447260, ns=0.9658923)
yhe, tau_re = jnp.float64(0.2453985), jnp.float64(0.05430138)

# --- thermo module view ---
th = jax.jit(lambda b: compute_thermo(b, yhe))(bg)
tab = compute_thermo_tables(bg, th, yhe)
der = thermo_derived(bg, tab)
out = {}
out["thermo"] = dict(z_star=float(der.z_star), r_star=float(der.r_star),
                     z_drag=float(der.z_drag), r_drag=float(der.r_drag))
oracle = dict(z_star=1089.920, r_star=144.3990, theta_star=1.041097e-2,
              DM_star=13869.89, z_drag=1059.971, r_drag=147.0552)
out["oracle"] = oracle

# --- dynamics view (perturbation grid) ---
k = source_k_grid()
po, chi_star, tf = jax.jit(lambda b: compute_transfers(b, tau_re, yhe, k, return_thermo=True))(bg)
taus = np.asarray(tf.tau); vis = np.asarray(tf.vis); a_g = np.asarray(tf.a)
ipk = int(np.nanargmax(vis))
print(f"# vis argmax at index {ipk}/{vis.size}, tau={taus[ipk]:.2f}", file=sys.stderr, flush=True)
tau0 = float(po.tau0)
tau_star_dyn = float(taus[ipk])
z_star_dyn = 1.0/a_g[ipk] - 1.0
# refine vis peak by quadratic fit
i0 = min(max(ipk, 2), vis.size - 3)
p = np.polyfit(taus[i0-2:i0+3], vis[i0-2:i0+3], 2)
tau_star_fit = float(-p[1]/(2*p[0]))
# sound horizon on the dynamics grid: integral c_s dtau with R from grho
g = _grho_terms(bg, jnp.asarray(a_g))
R = np.asarray((4.0/3.0) * g[0] / g[3])
cs = 1.0/np.sqrt(3.0*(1.0+R))
m = taus <= tau_star_fit
rs_dyn = np.trapz(cs[m], taus[m]) + cs[m][-1]*(tau_star_fit - taus[m][-1])
# add the early contribution from tau=0 to taus[0] (cs ~ 1/sqrt(3) there... R->0)
rs_early = taus[0]/np.sqrt(3.0)
rs_dyn += rs_early
out["dynamics"] = dict(tau0=tau0, tau_star_vispeak=tau_star_fit,
                       z_star_vispeak=float(z_star_dyn),
                       chi_star_used=float(chi_star),
                       DM_star=tau0 - tau_star_fit,
                       rs_dyn=float(rs_dyn),
                       theta_dyn=float(rs_dyn/(tau0 - tau_star_fit)))

# what does the conformal time table give for DM(z*) oracle z*?
lna_tab, tau_tab = _conformal_time_table(bg)
a_star = 1.0/(1.0+oracle["z_star"])
tau_at_zstar = float(np.interp(np.log(a_star), np.asarray(lna_tab), np.asarray(tau_tab)))
out["dynamics"]["DM_at_oracle_zstar"] = tau0 - tau_at_zstar

# --- spectra + dilation fit ---
spec = jax.jit(lambda p, c: cls_from_transfers(p, c, pp, lmax=2500))(po, chi_star)
lensed = jax.jit(lambda s: lens_cls(s.ls, s.tt, s.te, s.ee, s.pp))(spec)
REF_CL = "/root/reference/data/base_plikHM_TTTEEE_lowl_lowE.minimum.theory_cl"
ref = np.loadtxt(REF_CL)
L, rtt, ree = ref[:,0], ref[:,1], ref[:,3]
ls = np.asarray(lensed.ls, float); tt = np.asarray(lensed.tt); ee = np.asarray(lensed.ee)

def fit_dilation(ours, refv, lo=400, hi=2000):
    # find alpha minimizing rms of ours(l) vs ref(l/alpha) (alpha>1: our peaks at higher l)
    m = (ls>=lo)&(ls<=hi)
    best=(1e9,1.0)
    for alpha in np.linspace(0.95,1.05,2001):
        r = np.interp(ls[m]/alpha, L, refv)
        # allow free amplitude
        amp = np.sum(ours[m]*r)/np.sum(r*r)
        e = np.sqrt(np.mean((ours[m]/(amp*r)-1.0)**2))
        if e<best[0]: best=(e,alpha)
    return best
ett, att = fit_dilation(tt, rtt)
eee, aee = fit_dilation(ee, ree)
out["dilation"] = dict(tt_alpha=att, tt_resid_rms=ett, ee_alpha=aee, ee_resid_rms=eee)
# unlensed sharper: fit on unlensed vs... oracle only has lensed; skip.
# peak positions: first 5 TT peaks
def peaks(lv, cv, lo, hi):
    out=[]
    m=(lv>=lo)&(lv<=hi); lvm=lv[m]; cvm=cv[m]
    for i in range(2,len(lvm)-2):
        if cvm[i]>cvm[i-1] and cvm[i]>cvm[i+1] and cvm[i]>0.3*cvm.max():
            p=np.polyfit(lvm[i-2:i+3],cvm[i-2:i+3],2); out.append(-p[1]/(2*p[0]))
    return out
out["tt_peaks_ours"] = peaks(ls, tt, 150, 1800)[:6]
out["tt_peaks_ref"] = peaks(L, rtt, 150, 1800)[:6]
out["band_err"] = {}
for lo,hi in [(2,30),(30,300),(300,800),(800,1500),(1500,2200)]:
    m=(ls>=lo)&(ls<hi); r=np.interp(ls[m],L,rtt)
    out["band_err"][f"tt_{lo}_{hi}"]=float(np.sqrt(np.mean((tt[m]/r-1)**2)))
print(json.dumps(out, indent=1))
np.savez("/tmp/diag_spectra.npz", ls=ls, tt=tt, ee=ee, te=np.asarray(lensed.te),
         utt=np.asarray(spec.tt), uee=np.asarray(spec.ee), ute=np.asarray(spec.te),
         upp=np.asarray(spec.pp), L=L, ref=ref)
