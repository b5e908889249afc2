float polygon2d_afccc038ee(vec2 p) {
vec2 v[26] = vec2[26](vec2(78.0,-1.8),vec2(77.4613,6.147883),vec2(77.09183,14.105428),vec2(76.89173,22.069033),vec2(76.86112,30.035093),vec2(77.0,38.0),vec2(74.41181,38.34074),vec2(72.0,39.339745),vec2(69.92893,40.928932),vec2(68.339745,43.0),vec2(67.340744,45.411808),vec2(67.0,48.0),vec2(-1.8,48.0),vec2(-1.8,52.15),vec2(67.0,52.15),vec2(67.94416,48.894062),vec2(69.59625,45.933796),vec2(71.871666,43.42081),vec2(74.65386,41.483814),vec2(77.80036,40.222),vec2(81.15,39.7),vec2(80.98559,31.39522),vec2(81.00343,23.088829),vec2(81.20353,14.784832),vec2(81.585785,6.4872236),vec2(82.15,-1.8));
float d = dot(p-v[0],p-v[0]);
float s = 1.0;
for (int i=0, j=25; i<26; j=i, i++) {
  vec2 e = v[j]-v[i];
  vec2 w = p-v[i];
  vec2 b = w - e*clamp(dot(w,e)/dot(e,e),0.0,1.0);
  d = min(d, dot(b,b));
  bvec3 cond = bvec3(p.y>=v[i].y, p.y<v[j].y, e.x*w.y>e.y*w.x);
  if (all(cond) || all(not(cond))) s = -s;
}
return s*sqrt(d);
}

float symmetry2d_eca746d36f(vec2 p) {
p.xy = abs(p.xy);
return polygon2d_afccc038ee(p);
}

float offset2d_04108c6c56(vec2 p) {
return symmetry2d_eca746d36f(p)+(0.8);
}

float extrusion_cbf3bae8b9(vec3 p) {
float d = offset2d_04108c6c56(p.xy);
vec2 w = vec2(d, abs(p.z)-0.5);
return min(max(w.x,w.y),0.0)+length(max(w,0.0));
}
// ---- visualizer (sphere tracer) ----
float sceneSDF(vec3 p) {
    // center and scale the part to unit size for viewing
    return extrusion_cbf3bae8b9(p*82.15+vec3(0.0,0.0,0.0))/82.15;
}

vec3 sceneNormal(vec3 p) {
    const float h = 1e-4;
    vec2 k = vec2(1.0,-1.0);
    return normalize( k.xyy*sceneSDF(p+k.xyy*h)
                    + k.yyx*sceneSDF(p+k.yyx*h)
                    + k.yxy*sceneSDF(p+k.yxy*h)
                    + k.xxx*sceneSDF(p+k.xxx*h) );
}

float softShadow(vec3 ro, vec3 rd) {
    float res = 1.0;
    float t = 0.02;
    for (int i=0; i<48; i++) {
        float d = sceneSDF(ro+rd*t);
        res = min(res, 10.0*d/t);
        t += clamp(d, 0.005, 0.2);
        if (res < 0.002 || t > 5.0) break;
    }
    return clamp(res, 0.0, 1.0);
}

void mainImage(out vec4 fragColor, in vec2 fragCoord) {
    vec2 uv = (2.0*fragCoord - iResolution.xy)/iResolution.y;
    float yaw = 0.4*iTime + 6.2831*iMouse.x/iResolution.x;
    float pitch = 0.7 - 2.0*iMouse.y/iResolution.y;
    vec3 ro = 2.2*vec3(cos(yaw)*cos(pitch), sin(yaw)*cos(pitch), sin(pitch));
    vec3 ww = normalize(-ro);
    vec3 uu = normalize(cross(ww, vec3(0.0,0.0,1.0)));
    vec3 vv = cross(uu, ww);
    vec3 rd = normalize(uv.x*uu + uv.y*vv + 1.8*ww);

    float t = 0.0;
    float d = 0.0;
    for (int i=0; i<256; i++) {
        d = sceneSDF(ro + rd*t);
        if (abs(d) < 1e-4 || t > 6.0) break;
        t += d;
    }

    vec3 col = vec3(0.65, 0.78, 0.9) - 0.5*rd.z; // sky
    if (abs(d) < 1e-3) {
        vec3 pos = ro + rd*t;
        vec3 nor = sceneNormal(pos);
        vec3 lig = normalize(vec3(0.6, 0.4, 0.8));
        float dif = clamp(dot(nor, lig), 0.0, 1.0);
        float amb = 0.5 + 0.5*nor.z;
        float sha = softShadow(pos + nor*2e-3, lig);
        col = vec3(0.85, 0.6, 0.3)*(0.2*amb + 0.9*dif*sha);
        col += 0.1*pow(clamp(dot(reflect(rd, nor), lig), 0.0, 1.0), 16.0);
    }
    fragColor = vec4(pow(col, vec3(0.4545)), 1.0);
}
