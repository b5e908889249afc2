float boxshape_e2151443ff(vec3 p) {
vec3 q = abs(p)-vec3(10.0,10.0,5.0)+1.0;
return length(max(q,0.0))+min(max(q.x,max(q.y,q.z)),0.0)-1.0;
}

float cylinder_2698c14d7c(vec3 p) {
float dx = length(p.xy)-4.0;
float dy = abs(p.z)-15.0;
return min(0.0,max(dx,dy))+length(max(vec2(dx,dy),0.0));
}

float difference_4079b54e89(vec3 p) {
return max(boxshape_e2151443ff(p),-cylinder_2698c14d7c(p));
}
// ---- visualizer (sphere tracer) ----
float sceneSDF(vec3 p) {
    // center and scale the part to unit size for viewing
    return difference_4079b54e89(p*10.0+vec3(0.0,0.0,0.0))/10.0;
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
