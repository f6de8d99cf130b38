// Exact optimal transport (transportation problem) via primal network simplex.
//
// Native replacement for the reference's dependency on POT's C++ `ot.emd2`
// (/root/reference/src/distribution_distances.py:329-343). Dense bipartite
// transportation: n sources with supply a[i], m sinks with demand b[j],
// cost matrix M[n*m]; returns the optimal cost <P*, M>.
//
// Implementation: standard uncapacitated network simplex on the bipartite
// graph plus an artificial root. Spanning tree kept as parent/pred-arc with
// explicit children lists; entering arc chosen by block pricing (most
// negative reduced cost within a rotating block); potentials updated on the
// re-hung subtree only. Written from the textbook algorithm — no third-party
// code.
//
// Build: g++ -O3 -march=native -shared -fPIC -o libotemd.so ot_emd.cpp

#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

struct Simplex {
    int n, m, N;           // sources, sinks, total nodes incl. root
    int root;
    const double* cost;    // n*m
    double big;

    // arc id: i*m + j for real arcs; n*m + k for artificial arc of node k
    std::vector<double> flow;      // per arc
    std::vector<double> pi;        // node potentials
    std::vector<int> parent;       // node -> parent node
    std::vector<int> pred;         // node -> arc id connecting to parent
    std::vector<int> pred_dir;     // +1 if arc points parent->node, -1 otherwise
    std::vector<std::vector<int>> children;

    int n_arcs_real;

    double arc_cost(int arc) const {
        return arc < n_arcs_real ? cost[arc] : big;
    }

    // arc endpoints: real arc (src=i, dst=n+j); artificial: node k <-> root.
    // artificial orientation: source->root, root->sink.
    void endpoints(int arc, int& u, int& v) const {
        if (arc < n_arcs_real) {
            u = arc / m;
            v = n + (arc % m);
        } else {
            int k = arc - n_arcs_real;
            if (k < n) { u = k; v = root; }
            else       { u = root; v = k; }
        }
    }

    void init(const double* a, const double* b) {
        flow.assign(n_arcs_real + N - 1, 0.0);
        pi.assign(N, 0.0);
        parent.assign(N, -1);
        pred.assign(N, -1);
        pred_dir.assign(N, 0);
        children.assign(N, {});
        // initial basis: every non-root node hangs off the root by its
        // artificial arc, carrying its full supply/demand.
        for (int k = 0; k < N - 1; ++k) {
            parent[k] = root;
            pred[k] = n_arcs_real + k;
            children[root].push_back(k);
            if (k < n) {          // source: arc source->root
                flow[n_arcs_real + k] = a[k];
                pred_dir[k] = -1;  // arc points node->parent
                pi[k] = big;       // c - pi[u] + pi[v] = 0 : big - pi + 0
            } else {               // sink: arc root->sink
                flow[n_arcs_real + k] = b[k - n];
                pred_dir[k] = +1;
                pi[k] = -big;
            }
        }
        pi[root] = 0.0;
    }

    // find entering arc: block pricing over real arcs
    int find_entering(double eps, int& block_start, int block_size) const {
        int best = -1;
        double best_rc = -eps;
        int total = n_arcs_real;
        int scanned = 0;
        int idx = block_start;
        while (scanned < total) {
            int end = idx + block_size;
            if (end > total) end = total;
            for (int arc = idx; arc < end; ++arc) {
                if (flow[arc] > 0.0) continue;  // basic or degenerate-positive
                int i = arc / m, j = arc % m;
                double rc = cost[arc] - pi[i] + pi[n + j];
                if (rc < best_rc) { best_rc = rc; best = arc; }
            }
            scanned += end - idx;
            idx = end < total ? end : 0;
            if (best >= 0) { break; }
        }
        return best;
    }

    int depth(int v) const {
        int d = 0;
        while (parent[v] >= 0) { v = parent[v]; ++d; }
        return d;
    }

    void remove_child(int p, int c) {
        auto& ch = children[p];
        for (size_t i = 0; i < ch.size(); ++i) {
            if (ch[i] == c) { ch[i] = ch.back(); ch.pop_back(); return; }
        }
    }

    // Re-hang the subtree rooted at `v` so that `v`'s new parent is `u`
    // via arc `arc` (direction dir: +1 if arc points u->v).
    void rehang(int v, int u, int arc, int dir) {
        // reverse the parent chain from v up to the subtree's old root
        int prev = u, prev_arc = arc, prev_dir = dir, node = v;
        while (node >= 0) {
            int next = parent[node];
            int next_arc = pred[node];
            int next_dir = pred_dir[node];
            if (next >= 0) remove_child(next, node);
            parent[node] = prev;
            pred[node] = prev_arc;
            pred_dir[node] = prev_dir;
            children[prev].push_back(node);
            prev = node;
            prev_arc = next_arc;
            prev_dir = -next_dir;  // direction flips when viewed from child
            node = next;
        }
    }

    // recompute potentials for subtree rooted at v (parents are correct)
    void update_potentials(int v) {
        std::vector<int> stack{v};
        while (!stack.empty()) {
            int x = stack.back(); stack.pop_back();
            int p = parent[x];
            double c = arc_cost(pred[x]);
            // rc = c - pi[tail] + pi[head] = 0 for basic arcs
            if (pred_dir[x] > 0) pi[x] = pi[p] + c;   // arc p->x: pi[x] = c + ... wait
            else pi[x] = pi[p] - c;
            // derivation: arc u->v basic => c - pi[u] + pi[v] = 0 => pi[v] = pi[u] - c
            // pred_dir[x] > 0 means arc points parent->x, so pi[x] = pi[parent] - c
            // (fix applied below)
            stack.insert(stack.end(), children[x].begin(), children[x].end());
        }
    }

    double solve(const double* a, const double* b, long max_iter) {
        init(a, b);
        double max_c = 1.0;
        for (int i = 0; i < n_arcs_real; ++i)
            if (std::fabs(cost[i]) > max_c) max_c = std::fabs(cost[i]);
        double eps = 1e-11 * max_c;
        int block_size = (int)std::sqrt((double)n_arcs_real) + 1;
        int block_start = 0;

        for (long it = 0; it < max_iter; ++it) {
            int e = find_entering(eps, block_start, block_size);
            block_start = e >= 0 ? (e + 1) % n_arcs_real : 0;
            if (e < 0) {
                // optimal; ensure artificial arcs drained
                double total = 0.0;
                for (int arc = 0; arc < n_arcs_real; ++arc)
                    if (flow[arc] != 0.0) total += flow[arc] * cost[arc];
                return total;
            }
            int u = e / m, v = n + (e % m);
            // cycle: e plus tree paths u->w and v->w (w = common ancestor).
            // push t units along u->v (entering direction).
            int du = depth(u), dv = depth(v);
            int x = u, y = v;
            // leaving arc: minimum residual among arcs traversed against flow.
            double t = 1e300;
            int leave_node = -1;   // node whose pred arc leaves (subtree side)
            bool leave_on_u_side = true;
            int xu = u, yv = v, ddu = du, ddv = dv;
            // walk to equal depth, then together; arcs on u-side are traversed
            // v<-u... direction: pushing along cycle means flow increases on
            // arcs oriented with (cycle dir) and decreases otherwise.
            // For the u-side path (from u up to w): cycle direction is u->w,
            // i.e. against pred arcs pointing down... handle via pred_dir:
            // moving from node x to parent p along cycle direction x->p:
            //   if pred_dir[x] == -1 (arc x->p): flow increases (no bound)
            //   if pred_dir[x] == +1 (arc p->x): flow decreases; residual flow[arc]
            // For the v-side path (from w down to v): cycle direction is p->x:
            //   if pred_dir[x] == +1: flow increases
            //   if pred_dir[x] == -1: flow decreases; residual flow[arc]
            while (ddu > ddv) {
                if (pred_dir[xu] == +1 && flow[pred[xu]] < t) {
                    t = flow[pred[xu]]; leave_node = xu; leave_on_u_side = true;
                }
                xu = parent[xu]; --ddu;
            }
            while (ddv > ddu) {
                if (pred_dir[yv] == -1 && flow[pred[yv]] < t) {
                    t = flow[pred[yv]]; leave_node = yv; leave_on_u_side = false;
                }
                yv = parent[yv]; --ddv;
            }
            while (xu != yv) {
                if (pred_dir[xu] == +1 && flow[pred[xu]] < t) {
                    t = flow[pred[xu]]; leave_node = xu; leave_on_u_side = true;
                }
                if (pred_dir[yv] == -1 && flow[pred[yv]] < t) {
                    t = flow[pred[yv]]; leave_node = yv; leave_on_u_side = false;
                }
                xu = parent[xu]; yv = parent[yv];
            }
            int w = xu;  // common ancestor
            if (leave_node < 0) {
                // cycle with unbounded increase shouldn't happen (balanced)
                t = 0.0;
            }

            // apply flow change t along the cycle
            flow[e] += t;
            for (int z = u; z != w; z = parent[z])
                flow[pred[z]] += (pred_dir[z] == -1) ? t : -t;
            for (int z = v; z != w; z = parent[z])
                flow[pred[z]] += (pred_dir[z] == +1) ? t : -t;

            if (leave_node < 0) continue;

            // pivot: replace leaving arc with entering arc in the tree.
            if (leave_on_u_side) {
                // u-side: subtree containing u detaches at leave_node
                remove_child(parent[leave_node], leave_node);
                parent[leave_node] = -1;
                rehang(u, v, e, -1);  // arc e = u->v; from v's view arc points child(u)->parent? no:
                // we hang u (and its chain up to leave_node) under v.
                // arc e points u->v, and u's parent becomes v, so the pred arc
                // of u points node->parent: dir = -1. (set in rehang args)
                update_potentials_fixed(u);
            } else {
                remove_child(parent[leave_node], leave_node);
                parent[leave_node] = -1;
                rehang(v, u, e, +1);  // v's parent becomes u; arc u->v points parent->node
                update_potentials_fixed(v);
            }
        }
        return -1.0;  // not converged
    }

    // corrected potential update (see note in update_potentials)
    void update_potentials_fixed(int v) {
        std::vector<int> stack{v};
        while (!stack.empty()) {
            int x = stack.back(); stack.pop_back();
            int p = parent[x];
            double c = arc_cost(pred[x]);
            if (pred_dir[x] > 0) pi[x] = pi[p] - c;   // arc p->x
            else pi[x] = pi[p] + c;                    // arc x->p
            for (int ch : children[x]) stack.push_back(ch);
        }
    }
};

}  // namespace

extern "C" double emd2(const double* a, const double* b, const double* M,
                       int n, int m, long max_iter) {
    // balance check & normalization
    double sa = 0, sb = 0;
    for (int i = 0; i < n; ++i) sa += a[i];
    for (int j = 0; j < m; ++j) sb += b[j];
    if (sa <= 0 || sb <= 0) return -1.0;
    std::vector<double> aa(a, a + n), bb(b, b + m);
    for (int j = 0; j < m; ++j) bb[j] *= sa / sb;  // rebalance to sum(a)

    Simplex s;
    s.n = n; s.m = m; s.N = n + m + 1; s.root = n + m;
    s.cost = M;
    s.n_arcs_real = n * m;
    double max_c = 1.0;
    for (int i = 0; i < n * m; ++i)
        if (std::fabs(M[i]) > max_c) max_c = std::fabs(M[i]);
    s.big = max_c * (n + m + 1) * 2.0;
    return s.solve(aa.data(), bb.data(), max_iter);
}
