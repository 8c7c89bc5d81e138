"""Host-control-flow VCABM oracle following the torchdiffeq algorithm."""
import numpy as np

def gamma_star_table(K):
    from fractions import Fraction as Fr
    gs=[Fr(1)]
    for m in range(1,K+1):
        gs.append(-sum(gs[j]/(m+1-j) for j in range(m)))
    return np.array([float(g) for g in gs])

GS = gamma_star_table(14)

def g_and_explicit_phi(prev_t, next_t, implicit_phi, k):
    curr_t = prev_t[0]
    dt = next_t - prev_t[0]
    g = np.zeros(k+1); explicit_phi=[]
    beta=1.0; g[0]=1.0
    c = 1.0/np.arange(1,k+2)
    explicit_phi.append(implicit_phi[0])
    for j in range(1,k):
        beta = (next_t-prev_t[j-1])/(curr_t-prev_t[j])*beta
        explicit_phi.append(implicit_phi[j]*beta)
        c = c[:-1]-c[1:] if j==1 else c[:-1]-c[1:]*dt/(next_t-prev_t[j-1])
        g[j]=c[0]
    c = c[:-1]-c[1:]*dt/(next_t-prev_t[k-1])
    g[k]=c[0]
    return g, explicit_phi

def compute_implicit_phi(explicit_phi, f_n, k):
    k = min(len(explicit_phi)+1, k)
    out=[f_n]
    for j in range(1,k):
        out.append(out[j-1]-explicit_phi[j-1])
    return out

def err_ratio(vec, tol):
    return float(np.sqrt(np.mean((vec/tol)**2)))

def opt_dt(dt, ratio, order, safety=0.9, ifactor=10., dfactor=0.2):
    # Reference `_optimal_step_size`: accepted steps (ratio <= 1) never
    # shrink (lower clip forced to 1); rejected steps never grow.
    if ratio == 0: return dt*ifactor
    lo, hi = (1.0, ifactor) if ratio <= 1.0 else (dfactor, 1.0)
    return dt*np.clip(safety*ratio**(-1.0/order), lo, hi)

def vcabm(f, y0, ts, rtol, atol, max_order=12, first_step=None):
    t0 = ts[0]
    f0 = f(t0, y0)
    nfe=[1]
    def fn(t,y):
        nfe[0]+=1; return f(t,y)
    if first_step is None:
        # HNW select initial step, order 2
        scale = atol+rtol*np.abs(y0)
        d0=np.sqrt(np.mean((y0/scale)**2)); d1=np.sqrt(np.mean((f0/scale)**2))
        h0 = 1e-6 if (d0<1e-5 or d1<1e-5) else 0.01*d0/d1
        y1=y0+h0*f0; f1=fn(t0+h0,y1)
        d2=np.sqrt(np.mean(((f1-f0)/scale)**2))/h0
        dm=max(d1,d2)
        h1 = max(1e-6, h0*1e-3) if dm<=1e-15 else (0.01/dm)**(1.0/2)
        dt0=min(100*h0,h1)
    else: dt0=first_step
    prev_t=[t0]; phi=[f0]; y=y0.copy(); next_t=t0+dt0; order=1
    out=[y0]; oi=1
    n_acc=0; n_rej=0
    orders=[]
    while oi < len(ts):
        final_t = ts[oi]
        nt = min(next_t, final_t)
        dt = nt - prev_t[0]
        g, ephi = g_and_explicit_phi(np.array(prev_t+[0]*20), nt, phi, order)
        np_ = max(1, order-1)
        p_next = y + dt*sum(g[j]*ephi[j] for j in range(np_))
        f_pred = fn(nt, p_next)
        phi_p = compute_implicit_phi(ephi, f_pred, order+1)
        # Corrector index clamped >= 1 (see solvers/adams.py NOTE: fixes the
        # reference's inconsistent order-1 step, identical for order >= 2).
        cidx = max(order-1, 1)
        y_next = p_next + dt*g[cidx]*phi_p[cidx]
        tol = atol + rtol*np.maximum(np.abs(y), np.abs(y_next))
        error_k = err_ratio(dt*(g[order]-g[order-1])*phi_p[order], tol)
        if error_k > 1:
            n_rej+=1
            dt_next = opt_dt(dt, error_k, order)
            next_t = prev_t[0]+dt_next
            continue
        n_acc+=1
        f_next = fn(nt, y_next)
        iphi = compute_implicit_phi(ephi, f_next, order+2)
        next_order = order
        if len(prev_t) <= 4 or order < 3:
            next_order = min(order+1, 3, max_order)
        else:
            error_km1 = err_ratio(dt*(g[order-1]-g[order-2])*phi_p[order-1], tol)
            error_km2 = err_ratio(dt*(g[order-2]-g[order-3])*phi_p[order-2], tol)
            if min(error_km1, error_km2) < error_k:
                next_order = order-1
            elif order < min(max_order, len(prev_t)):
                error_kp1 = err_ratio(dt*GS[order]*iphi[order], tol)
                if error_kp1 < error_k:
                    next_order = order+1
        dt_next = dt if next_order > order else opt_dt(dt, error_k, order+1)
        orders.append(next_order)
        prev_t=[nt]+prev_t[:max_order]
        phi = iphi
        y = y_next
        order = next_order
        next_t = nt + dt_next
        if nt >= final_t:
            out.append(y); oi+=1
    return np.stack(out), nfe[0], n_acc, n_rej, orders
